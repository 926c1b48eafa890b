"""Animation entry (C24) and CLI coverage (VERDICT r3 item 6).

test_anim parity targets (reference: core.clj:181-213): per-frame camera
path (theta 0->350, fov 115), and the accumulation buffer deliberately NOT
cleared between frames — temporal blending (core.clj:194-208), observable
whenever iter > 1 (frameBlend < 1 keeps a share of the previous frame).

CLI (reference: README.org:9-38 lein run workflow): argparse smoke tests of
render/anim/gen-volume/voxelize/info driving the same library entry points.
"""

import struct

import numpy as np
import pytest

from raymarchcl_tpu import api
from raymarchcl_tpu.__main__ import main as cli_main
from raymarchcl_tpu.io import voxio
from raymarchcl_tpu.io.imageio import load_gray
from raymarchcl_tpu.ops import render as render_mod
from raymarchcl_tpu.ops.camera import compute_eyepos


def test_anim_frames_differ_and_accum_persists(tmp_path):
    """3 frames at 48x27, iter=2: every frame differs (the camera orbits),
    and frame 1 differs from a FRESH render of the identical frame-1
    configuration — the accumulation buffer carried across frames is the
    reference's temporal-blend quirk (core.clj:194-208)."""
    out = tmp_path / "anim"
    paths = api.test_anim(
        48, 27, 2, 16, "ao", out_dir=str(out), frames=3, verbose=False
    )
    assert len(paths) == 3
    imgs = [load_gray(p) for p in paths]
    assert imgs[0].shape == (27, 48)
    assert not np.array_equal(imgs[0], imgs[1])
    assert not np.array_equal(imgs[1], imgs[2])

    # fresh render of frame #1's exact configuration (no carried accum)
    frame, frames = 1, 3
    t = frame / frames
    volume, vres = api.load_or_generate_volume(None, (16, 16, 16))
    import jax.numpy as jnp

    times = jnp.arange(2, dtype=jnp.float32) * render_mod.TIME_STEP_ANIM
    argb, _ = api.render_frame(
        volume, vres, iter=2, times=times, width=48, height=27, mat="ao",
        fov=115.0, targetpos=[0, -0.15, 0],
        eyepos=compute_eyepos(t * 350.0, 2.25, 0.44 + t * 0.01),
    )
    fresh_gray = (np.asarray(argb) & 0xFF).astype(np.uint8)
    assert not np.array_equal(fresh_gray, imgs[1]), (
        "frame 1 must blend the previous frame's accumulation"
    )


def test_cli_gen_volume_and_info(tmp_path, capsys):
    out = tmp_path / "g.vox"
    cli_main(["gen-volume", "gyroid", "--vres", "16", "-o", str(out)])
    vox, res = voxio.load_volume(str(out))
    assert res == (16, 16, 16) and vox.size == 16**3
    cli_main(["info"])
    cap = capsys.readouterr()
    assert "backend:" in cap.out


def test_cli_voxelize(tmp_path):
    stl = tmp_path / "tri.stl"
    tris = [np.array([[0.2, 0.2, 0.5], [0.8, 0.2, 0.5], [0.5, 0.8, 0.5]])]
    with open(stl, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, np.float32).tobytes())
            f.write(t.astype("<f4").tobytes())
            f.write(struct.pack("<H", 0))
    out = tmp_path / "m.vox"
    cli_main(["voxelize", str(stl), "--res", "16", "-o", str(out)])
    vox, res = voxio.load_volume(str(out))
    assert res == (16, 16, 16) and (vox > 0).sum() > 0


def test_cli_render_preview(tmp_path):
    out = tmp_path / "r.png"
    cli_main([
        "render", "--width", "32", "--height", "18", "--iter", "1",
        "--vres", "16", "--mat", "ao", "--preview", "-o", str(out),
    ])
    img = load_gray(str(out))
    assert img.shape == (18, 32)
    assert img.std() > 0  # not a flat frame


def test_cli_rejects_unknown_command(capsys):
    with pytest.raises(SystemExit):
        cli_main(["frobnicate"])
