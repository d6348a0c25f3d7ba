"""Regression: safetensors-numpy 0.8.0 serializes the raw array buffer
WITHOUT honoring strides — saving a non-contiguous (e.g. F-ordered)
array scrambles it silently.  This bit the accuracy certification
rehearsal: ``gptq_pack``'s scales came out of max/min reductions
F-ordered, the checkpoint carried scrambled scales, and the engine's
(correct) ingestion was blamed for a 0.13-NLL "divergence".

Every checkpoint writer in this repo must pass C-contiguous arrays to
``save_file`` (accuracy_cert.py does ``np.ascontiguousarray`` on all
tensors).  This test pins the footgun so a future safetensors upgrade
or fixture regression is caught.
"""
import numpy as np
import pytest


def test_noncontiguous_fp16_save_is_hazardous(tmp_path):
    from safetensors.numpy import load_file, save_file
    rng = np.random.default_rng(0)
    base = rng.normal(size=(128, 4)).astype(np.float16)
    noncontig = base.T                    # (4, 128), strides reversed
    assert not noncontig.flags["C_CONTIGUOUS"]
    f = str(tmp_path / "t.safetensors")
    try:
        save_file({"s": noncontig}, f)
    except (ValueError, RuntimeError):
        # A safetensors version that REJECTS non-contiguous input is
        # safe behavior; nothing more to check.
        return
    loaded = load_file(f)["s"]
    if np.array_equal(loaded, noncontig):
        pytest.skip("this safetensors version handles strides correctly")
    # Documented hazard: silent scramble. The contiguous copy must
    # always round-trip exactly.
    save_file({"s": np.ascontiguousarray(noncontig)}, f)
    assert np.array_equal(load_file(f)["s"], noncontig)


def test_accuracy_cert_pack_returns_contiguous():
    import sys
    sys.path.insert(0, "/root/repo")
    import accuracy_cert as ac
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    qw, qz, sc, deq = ac.gptq_pack(w, 128)
    for name, a in (("qweight", qw), ("qzeros", qz), ("scales", sc)):
        assert a.flags["C_CONTIGUOUS"], name
