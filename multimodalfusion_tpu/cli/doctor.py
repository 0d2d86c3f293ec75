"""Environment doctor: one command that tells a new deployment what
works, what's missing, and what will run degraded.

No reference equivalent (the reference surfaces environment problems as
mid-run stack traces).  Checks are grouped and each prints one line:

    [ok]   platform: jax 0.9.x backend=tpu devices=[TPU v5 lite0]
    [ok]   native: libbagio.so loaded (threaded bag collation)
    [warn] optional: openslide missing -> PIL/array WSI backends only
    ...

Exit code 0 when nothing failed (warnings are fine), 1 otherwise.
``--full`` adds the fused-kernel numerics check on the current backend
(compiles a small Pallas program — slow on a remote-compile TPU relay).

Run:  python -m multimodalfusion_tpu.cli.doctor [--full]
"""
from __future__ import annotations

import argparse
import importlib
import os
import sys
import tempfile

import numpy as np

_FAILED = False


def _line(status: str, msg: str) -> None:
    global _FAILED
    if status == "fail":
        _FAILED = True
    print(f"[{status}]".ljust(7) + msg)


def check_platform():
    try:
        import jax
        devs = jax.devices()
        _line("ok", f"platform: jax {jax.__version__} "
              f"backend={jax.default_backend()} "
              f"devices={[str(d) for d in devs]}")
        if jax.default_backend() == "cpu":
            _line("warn", "platform: running on CPU — fused Pallas "
                  "kernels fall back to XLA forms (correct, slower)")
    except Exception as e:
        _line("fail", f"platform: jax unusable ({e})")


def check_native():
    try:
        from multimodalfusion_tpu import native
        lib = native.get_lib()
        if lib is None:
            _line("warn", "native: libbagio.so not built — bag collation "
                  "runs single-threaded numpy (build: make -C native)")
        elif hasattr(lib, "mmf_jpeg_lossless_decode"):
            _line("ok", "native: libbagio.so loaded (threaded bag "
                  "collation + lossless-JPEG decode)")
        else:
            _line("warn", "native: libbagio.so is a STALE build without "
                  "the lossless-JPEG decoder — CT decode falls back to "
                  "Python (~30x slower; rebuild: make -C native)")
    except Exception as e:
        _line("warn", f"native: unavailable ({e}) — numpy fallback")


_OPTIONAL = [
    ("openslide", "pyramidal WSI IO (PIL/array backends still work; "
     "PILSlide is size-gated)"),
    ("pydicom", "DICOM via pydicom (native data/dicom.py reader is the "
     "fallback and handles uncompressed LE/BE, deflated, RLE, JPEG "
     "Lossless, and the JPEG/J2K syntaxes PIL decodes)"),
    ("lungmask", "U-Net lung segmentation (classical fallback: "
     "dice>0.95 on phantoms, under-segments dense pathology)"),
    ("tensorboardX", "--tb event files"),
    ("orbax.checkpoint", "--ckpt_format orbax resume bundles"),
]


def check_optional():
    for mod, what in _OPTIONAL:
        try:
            importlib.import_module(mod)
            _line("ok", f"optional: {mod} present — {what.split('(')[0]}")
        except ImportError:
            _line("warn", f"optional: {mod} missing -> {what}")


def check_io():
    from multimodalfusion_tpu.data.dicom import read_file, write_ct_slice
    from multimodalfusion_tpu.data.nifti import read_nifti, write_nifti
    with tempfile.TemporaryDirectory() as d:
        vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        p = os.path.join(d, "t.nii.gz")
        write_nifti(p, vol)
        back = read_nifti(p).data
        if np.array_equal(back, vol):
            _line("ok", "io: NIfTI write/read round-trip")
        else:
            _line("fail", "io: NIfTI round-trip mismatch")
        px = np.arange(64, dtype=np.int16).reshape(8, 8)
        dp = os.path.join(d, "t.dcm")
        write_ct_slice(dp, px, z=1.0)
        ds = read_file(dp)
        if np.array_equal(ds.pixel_array, px):
            _line("ok", "io: DICOM write/read round-trip (native reader)")
        else:
            _line("fail", "io: DICOM round-trip mismatch")


def check_numerics(full: bool):
    import jax
    import jax.numpy as jnp
    from multimodalfusion_tpu.ops import mil_attention as mil
    rng = np.random.default_rng(0)
    B, N, D, Da = 2, 200, 64, 32
    h = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    lens = np.array([[150], [200]])
    mask = jnp.asarray(np.arange(N)[None, :] < lens, jnp.float32)
    params = mil.AttnParams(
        Wa=jnp.asarray(rng.normal(size=(D, Da)) * 0.1, jnp.float32),
        ba=jnp.zeros(Da), Wb=jnp.asarray(
            rng.normal(size=(D, Da)) * 0.1, jnp.float32),
        bb=jnp.zeros(Da),
        wc=jnp.asarray(rng.normal(size=(Da, 1)) * 0.1, jnp.float32),
        cc=jnp.zeros(1))
    ref = mil._pool_reference(h, mask, params, True)
    if jax.default_backend() == "tpu" and full:
        fused = mil._fused_pool_pallas(h, mask, params, True)[0]
        err = float(jnp.max(jnp.abs(fused - ref)))
        if err < 1e-2:
            _line("ok", f"numerics: fused Pallas pooling matches the XLA "
                  f"oracle on-chip (max |d| {err:.1e})")
        else:
            _line("fail", f"numerics: fused pooling deviates {err:.1e} "
                  "(run tools/tpu_kernel_selftest.py)")
    else:
        fused = mil._fused_pool_pallas(h, mask, params, True,
                                       interpret=True)[0]
        err = float(jnp.max(jnp.abs(fused - ref)))
        if err < 1e-4:
            _line("ok", f"numerics: fused pooling (interpret mode) "
                  f"matches the XLA oracle (max |d| {err:.1e})")
        else:
            _line("fail", f"numerics: interpret-mode pooling deviates "
                  f"{err:.1e}")
    out = float(jnp.sum(ref))
    if np.isfinite(out):
        _line("ok", "numerics: forward pass finite")
    else:
        _line("fail", "numerics: non-finite forward output")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="environment doctor")
    p.add_argument("--full", action="store_true", default=False,
                   help="also compile the fused kernel on the current "
                        "backend (slow through a remote-compile relay)")
    args = p.parse_args(argv)
    global _FAILED
    _FAILED = False
    check_platform()
    check_native()
    check_optional()
    check_io()
    check_numerics(args.full)
    print("doctor:", "FAIL" if _FAILED else "ok")
    return 1 if _FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
