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

    import jax.numpy as jnp

    from raymarchcl_tpu import api
    from raymarchcl_tpu.ops import render as render_mod
    from raymarchcl_tpu.ops.camera import compute_eyepos
    from raymarchcl_tpu.ops.sampling import make_mc_tables
    from raymarchcl_tpu.options import render_options

    # volume + accel built ONCE: the timing below is the render only (the
    # API path rebuilds the accel per call — ~1 s of host numpy at vres 256
    # — which is amortized across an interactive session and must not
    # pollute the preview-vs-full comparison)
    volume, vres3 = api.default_volume((args.vres,) * 3)
    base_kw = dict(
        width=args.size, height=args.size, vres=list(vres3), mat=args.mat,
        eyepos=compute_eyepos(135.0, 2.25, 0.35), targetpos=[0, -0.4, 0],
    )
    vol = jnp.asarray(volume, jnp.uint8).reshape(-1)

    def render(preview, iter, tag):
        kw = dict(base_kw)
        if preview:
            merged, iter = api.preview_overrides({}, iter)
            kw.update(merged)
        opts = render_options(iter=iter, **kw)
        accel = api.build_accel_for(volume, opts)
        tables = make_mc_tables(iter, seed=0)
        times = jnp.arange(iter, dtype=jnp.float32) * render_mod.TIME_STEP_INIT

        def go(eps):
            argb, _ = render_mod._render_jit(
                vol, opts, tables, times + eps,
                jnp.zeros((opts.num_pixels, 3), jnp.float32), accel,
            )
            return np.asarray(argb)

        go(jnp.float32(0.0))  # compile
        t0 = time.perf_counter()
        argb = go(jnp.float32(1e-7))
        dt = time.perf_counter() - t0
        print(f"  {tag}: {dt:.3f}s", flush=True)
        return argb.reshape(args.size, args.size), dt

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
