"""Native C++ host runtime (bagio): builds, matches numpy semantics,
and outperforms the single-threaded path on large batches."""
import time

import numpy as np
import pytest

from multimodalfusion_tpu import native
from multimodalfusion_tpu.data.bags import pad_bags


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native runtime not built")
    return lib


def test_pad_bags_native_matches_numpy(lib, rng):
    D = 64
    bags = [rng.normal(size=(n, D)).astype(np.float32)
            for n in (5, 120, 0, 77)]
    bags[2] = None
    out, mask = native.pad_bags_native(bags, 128, D)
    assert out.shape == (4, 128, D) and mask.shape == (4, 128)
    np.testing.assert_array_equal(out[0, :5], bags[0])
    np.testing.assert_array_equal(out[1, :120], bags[1])
    assert out[0, 5:].sum() == 0 and mask[2].sum() == 0
    np.testing.assert_array_equal(mask[3, :77], 1.0)
    # numpy-path equivalence through the public pad_bags
    out2, mask2 = pad_bags(bags, D)
    np.testing.assert_array_equal(out, out2)
    np.testing.assert_array_equal(mask, mask2)


def test_pad_bags_truncates_overlong(lib, rng):
    D = 8
    bag = rng.normal(size=(300, D)).astype(np.float32)
    out, mask = native.pad_bags_native([bag], 128, D)
    np.testing.assert_array_equal(out[0], bag[:128])
    assert mask.sum() == 128


def test_f32_to_bf16_rne(lib):
    x = np.array([1.0, -2.5, 3.1415927, 65504.0, 1e-8, 0.0],
                 np.float32)
    out = native.f32_to_bf16(x)
    assert out is not None
    import ml_dtypes
    ref = x.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out.view(np.uint16),
                                  ref.view(np.uint16))


def test_f32_to_bf16_random_parity(lib, rng):
    x = rng.normal(size=100000).astype(np.float32)
    out = native.f32_to_bf16(x)
    import ml_dtypes
    ref = x.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))


def test_read_files(lib, tmp_path, rng):
    paths, sizes, datas = [], [], []
    for i in range(4):
        data = rng.integers(0, 256, size=1000 + i, dtype=np.uint8)
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(data.tobytes())
        paths.append(str(p))
        sizes.append(len(data))
        datas.append(data)
    bufs = native.read_files(paths, sizes)
    assert bufs is not None
    for b, d in zip(bufs, datas):
        np.testing.assert_array_equal(b, d)


def test_read_files_missing_returns_none(lib, tmp_path):
    assert native.read_files([str(tmp_path / "nope.bin")], [10]) is None


def test_native_pad_speedup(lib, rng):
    """With buffer reuse (the training-loop mode), the C++ collation must
    beat the naive numpy loop on a realistic big batch."""
    D = 1024
    bags = [rng.normal(size=(int(n), D)).astype(np.float32)
            for n in rng.integers(4000, 8192, size=8)]
    n_pad = 8192
    native.pad_bags_native(bags, n_pad, D, reuse_buffers=True)  # warm pool
    t0 = time.perf_counter()
    for _ in range(3):
        native.pad_bags_native(bags, n_pad, D, reuse_buffers=True)
    t_native = (time.perf_counter() - t0) / 3

    def numpy_pad():
        out = np.zeros((8, n_pad, D), np.float32)
        mask = np.zeros((8, n_pad), np.float32)
        for i, b in enumerate(bags):
            out[i, :len(b)] = b
            mask[i, :len(b)] = 1
        return out, mask

    t0 = time.perf_counter()
    for _ in range(3):
        numpy_pad()
    t_numpy = (time.perf_counter() - t0) / 3
    print(f"native(warm) {t_native*1e3:.1f} ms vs numpy {t_numpy*1e3:.1f} ms")
    assert t_native < t_numpy


def test_buffer_reuse_correctness(lib, rng):
    """Two consecutive reuse-mode calls must each reflect their own
    inputs (the pool hands back the same array object)."""
    D = 16
    b1 = [rng.normal(size=(10, D)).astype(np.float32)]
    b2 = [rng.normal(size=(7, D)).astype(np.float32)]
    o1, m1 = native.pad_bags_native(b1, 128, D, reuse_buffers=True)
    first = o1[0, :10].copy()
    o2, m2 = native.pad_bags_native(b2, 128, D, reuse_buffers=True)
    assert o2 is o1  # pooled
    np.testing.assert_array_equal(o2[0, :7], b2[0])
    assert m2[0].sum() == 7
    assert o2[0, 7:].sum() == 0  # stale rows cleared


def test_f32_to_bf16_nan_preserved(lib):
    """NaN payloads must stay NaN (not launder into Inf/0 via the RNE
    add)."""
    import ml_dtypes
    x = np.array([np.float32("nan"), -np.float32("nan"), np.inf, -np.inf],
                 np.float32)
    # payload-only NaNs that overflow a naive rounding add
    tricky = np.array([0x7F800001, 0xFFFFFFFF], np.uint32).view(np.float32)
    x = np.concatenate([x, tricky])
    out = native.f32_to_bf16(x)
    assert np.isnan(out[0].astype(np.float32))
    assert np.isnan(out[1].astype(np.float32))
    assert out[2].astype(np.float32) == np.inf
    assert out[3].astype(np.float32) == -np.inf
    assert np.isnan(out[4].astype(np.float32))
    assert np.isnan(out[5].astype(np.float32))


def test_pad_bags_native_rejects_1d(lib):
    assert native.pad_bags_native([np.zeros(16, np.float32)], 128, 16) \
        is None
