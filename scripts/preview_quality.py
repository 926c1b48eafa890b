"""Preview-mode cost/quality measurement (VERDICT r2 item 6).

Renders the same scene with full reference budgets and with
api.PREVIEW_BUDGETS, reports speedup and SSIM (uniform 8x8 window, standard
K1/K2 constants, computed per RGB channel on the packed bytes and averaged).
Numbers recorded in PERFORMANCE.md ("Preview mode").

Usage: python scripts/preview_quality.py [--size 256] [--vres 256] [--mat ao]
       [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def ssim(a, b, window=8, k1=0.01, k2=0.03, L=255.0):
    """Mean SSIM over non-overlapping window x window blocks."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    h, w = a.shape[:2]
    h, w = h - h % window, w - w % window
    a, b = a[:h, :w], b[:h, :w]

    def blocks(x):
        return x.reshape(h // window, window, w // window, window, -1).transpose(
            0, 2, 4, 1, 3
        ).reshape(h // window, w // window, -1, window * window)

    ba, bb = blocks(a), blocks(b)
    mu_a, mu_b = ba.mean(-1), bb.mean(-1)
    var_a, var_b = ba.var(-1), bb.var(-1)
    cov = (ba * bb).mean(-1) - mu_a * mu_b
    c1, c2 = (k1 * L) ** 2, (k2 * L) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(s.mean())


def argb_to_rgb(argb):
    return np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=-1
    ).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--vres", type=int, default=256)
    ap.add_argument("--mat", default="ao")
    ap.add_argument("--spp", type=int, default=4, help="full-quality spp")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from raymarchcl_tpu import api

    def render(preview, iter, tag):
        # warm-up compile, then timed run (fetch-timed; see PERFORMANCE.md)
        kw = dict(
            width=args.size, height=args.size, iter=iter, vres=args.vres,
            mat=args.mat, out_path=None, verbose=False, preview=preview,
        )
        api.test_render(seed=1, **kw)
        t0 = time.perf_counter()
        argb = api.test_render(seed=0, **kw)
        dt = time.perf_counter() - t0
        print(f"  {tag}: {dt:.3f}s")
        return np.asarray(argb), dt

    full, t_full = render(False, args.spp, f"full ({args.spp} spp, ref budgets)")
    prev, t_prev = render(True, 1, "preview (1 spp, quarter budgets)")
    s = ssim(argb_to_rgb(full), argb_to_rgb(prev))
    print(
        f"size={args.size} vres={args.vres} mat={args.mat}: "
        f"full={t_full:.3f}s preview={t_prev:.3f}s "
        f"speedup={t_full / t_prev:.1f}x SSIM={s:.4f}"
    )


if __name__ == "__main__":
    main()
