"""Fused dequant-GEMM kernel vs jnp reference
(mirrors reference tests/kernels/test_marlin_gemm.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.quant_matmul import (pack_weights, quant_matmul,
                                         quant_matmul_reference,
                                         quantize_weights_to_packed,
                                         unpack_weights)


def test_pack_unpack_roundtrip(rng):
    k, n, bits, g = 512, 256, 4, 128
    w = jax.random.randint(rng, (k, n), 0, 2**bits, jnp.int32)
    packed = pack_weights(w, bits, g)
    assert packed.shape == (k // 8, n)
    out = unpack_weights(packed, bits, g, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


def test_pack_unpack_roundtrip_8bit(rng):
    k, n, bits, g = 256, 128, 8, 64
    w = jax.random.randint(rng, (k, n), 0, 2**bits, jnp.int32)
    packed = pack_weights(w, bits, g)
    assert packed.shape == (k // 4, n)
    out = unpack_weights(packed, bits, g, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


@pytest.mark.parametrize("bits,m,symmetric", [
    (4, 13, True),
    (4, 1, False),
    (8, 13, True),
])
def test_quant_matmul_matches_reference(rng, bits, m, symmetric):
    k, n, g = 512, 256, 128
    kw, kx = jax.random.split(rng)
    w = jax.random.normal(kw, (n, k), jnp.float32) * 0.1
    qweight, scales, zeros = quantize_weights_to_packed(
        w, bits, g, symmetric=symmetric)
    x = jax.random.normal(kx, (m, k), jnp.float32)
    ref = quant_matmul_reference(x, qweight, scales, zeros, bits=bits,
                                 group_size=g)
    out = quant_matmul(x, qweight, scales, zeros, bits=bits, group_size=g,
                       block_n=128, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_quantize_dequant_accuracy(rng):
    # INT4 groupwise quantization of gaussian weights should reconstruct
    # with small relative error (sanity for the ingestion path).
    n, k, g = 128, 512, 128
    w = jax.random.normal(rng, (n, k), jnp.float32)
    qweight, scales, zeros = quantize_weights_to_packed(w, 4, g)
    w_int = unpack_weights(qweight, 4, g, k)
    z = jnp.repeat(zeros.astype(jnp.int32), g, axis=0)
    s = jnp.repeat(scales, g, axis=0)
    w_rec = ((w_int - z).astype(jnp.float32) * s).T
    err = np.abs(np.asarray(w_rec - w)).mean() / np.abs(np.asarray(w)).mean()
    assert err < 0.15, err  # 4-bit gaussian quantization: ~0.125 expected


class TestW4A8Paths:
    """W4A8 kernels: int8-activation INT4 serving (Machete-class successor
    to the Marlin W4A16 path)."""

    def _mk(self, M=16, K=512, N=256, G=128, seed=0):
        import numpy as np
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import (pack_weights,
                                                 pack_weights_sequential)
        rng = np.random.default_rng(seed)
        w_int = rng.integers(0, 16, (K, N))
        # Legacy sequential layout for the w4a8 experiment kernel; paired
        # canonical layout for the serving-path reference.
        qw = pack_weights_sequential(jnp.asarray(w_int), 4)
        self.qw_paired = pack_weights(jnp.asarray(w_int), 4, G)
        scales = jnp.asarray(rng.normal(0, 0.02, (K // G, N)), jnp.float32)
        zeros = jnp.full((K // G, N), 8, jnp.int32)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
        return x, w_int, qw, scales, zeros, G, K

    def test_w4a8_packed_matches_w4a16(self):
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import (quant_matmul_reference,
                                                 w4a8_matmul)
        x, _, qw, scales, zeros, G, K = self._mk()
        out = w4a8_matmul(x, qw, scales, group_size=G)
        ref = quant_matmul_reference(x, self.qw_paired, scales, zeros,
                                     bits=4, group_size=G)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel  # activation-quant noise only

    def test_int8_grouped_matches_dense(self):
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import int8_grouped_matmul
        x, w_int, _, scales, _, G, K = self._mk()
        w8 = jnp.asarray(w_int - 8, jnp.int8)
        out = int8_grouped_matmul(x, w8, scales, group_size=G)
        sfull = jnp.repeat(scales, G, axis=0)
        ref = x @ (w8.astype(jnp.float32) * sfull)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_int8_grouped_equals_w4a16_within_act_noise(self):
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import (int8_grouped_matmul,
                                                 quant_matmul_reference)
        x, w_int, qw, scales, zeros, G, K = self._mk()
        w8 = jnp.asarray(w_int - 8, jnp.int8)
        out = int8_grouped_matmul(x, w8, scales, group_size=G)
        ref = quant_matmul_reference(x, self.qw_paired, scales, zeros,
                                     bits=4, group_size=G)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel


class TestInt8Channel:
    def _mk(self, M=16, K=256, N=256, G=128, seed=3):
        import numpy as np
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import pack_weights
        rng = np.random.default_rng(seed)
        w_int = rng.integers(0, 16, (K, N))
        qw = pack_weights(jnp.asarray(w_int), 4, G)
        scales = jnp.asarray(np.abs(rng.normal(0, 0.02, (K // G, N))) + 1e-3,
                             jnp.float32)
        zeros = jnp.full((K // G, N), 8, jnp.int32)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
        return x, w_int, qw, scales, zeros, G, K

    def test_int8_channel_matches_dense(self):
        import numpy as np
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import int8_channel_matmul
        x, w_int, _, _, _, G, K = self._mk()
        rng = np.random.default_rng(7)
        w8 = jnp.asarray(rng.integers(-127, 128, (K, 256)), jnp.int8)
        ch = jnp.asarray(np.abs(rng.normal(0, 0.01, (256,))) + 1e-4,
                         jnp.float32)
        out = int8_channel_matmul(x, w8, ch)
        ref = x @ (w8.astype(jnp.float32) * ch[None, :])
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel  # activation-quant noise only

    def test_requantize_channel_close_to_grouped(self):
        """INT4-group -> int8-channel requantization adds only sub-INT4
        rounding error (docs/PERF_NOTES.md channel-mode analysis)."""
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import (
            int8_channel_matmul, quant_matmul_reference,
            requantize_grouped_to_int8_channel)
        x, w_int, qw, scales, zeros, G, K = self._mk()
        w8, ch = requantize_grouped_to_int8_channel(
            qw, scales, zeros, bits=4, group_size=G, k=K)
        # Weight-level: dequantized int8-channel vs dequantized int4-group.
        w_ref = (jnp.asarray(w_int) - 8).astype(jnp.float32) * \
            jnp.repeat(scales, G, axis=0)
        w_req = w8.astype(jnp.float32) * ch[None, :]
        wrel = float(jnp.linalg.norm(w_req - w_ref) /
                     jnp.linalg.norm(w_ref))
        assert wrel < 0.01, wrel
        # Output-level through the serving kernel.
        out = int8_channel_matmul(x, w8, ch)
        ref = quant_matmul_reference(x, qw, scales, zeros, bits=4,
                                     group_size=G)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.03, rel


class TestPrologues:
    """Fused activation prologues (silu*up / gelu*up / rmsnorm) on the
    paired W4 kernel vs jnp reference composition."""

    def _mk(self, M=8, K=256, N=256, G=128, seed=11):
        import numpy as np
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import pack_weights
        rng = np.random.default_rng(seed)
        w_int = rng.integers(0, 16, (K, N))
        qw = pack_weights(jnp.asarray(w_int), 4, G)
        scales = jnp.asarray(np.abs(rng.normal(0, 0.02, (K // G, N)))
                             + 1e-3, jnp.float32)
        zeros = jnp.full((K // G, N), 8, jnp.int32)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
        u = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
        gamma = jnp.asarray(np.abs(rng.normal(1, 0.1, (K,))), jnp.float32)
        return x, u, gamma, qw, scales, zeros, G

    @pytest.mark.parametrize("prologue", ["silu_mul", "gelu_mul",
                                          "rmsnorm"])
    def test_prologue_matches_composition(self, prologue):
        import numpy as np
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import (apply_prologue_jnp,
                                                 quant_matmul)
        x, u, gamma, qw, scales, zeros, G = self._mk()
        aux = gamma if prologue == "rmsnorm" else u
        fused = quant_matmul(x, qw, scales, zeros, bits=4, group_size=G,
                             prologue=prologue, aux=aux, eps=1e-5)
        pre = apply_prologue_jnp(prologue, x, aux, 1e-5)
        ref = quant_matmul(pre, qw, scales, zeros, bits=4, group_size=G)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)


def test_epilogue_add_fused():
    """Fused residual-add epilogue == matmul + add (bit-exact: both add
    the residual to the f32 accumulator before the output cast)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nmvllm_tpu.ops.quant_matmul import pack_weights, quant_matmul
    rng = np.random.default_rng(7)
    m, k, n, g = 16, 256, 256, 128
    w4 = rng.integers(0, 16, (k, n)).astype(np.int32)
    scales = (rng.random((k // g, n), np.float32) * 0.02 + 0.01)
    zeros = np.full((k // g, n), 8, np.int32)
    qw = pack_weights(w4, 4, g)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
    base = quant_matmul(x, qw, jnp.asarray(scales), jnp.asarray(zeros),
                        bits=4, group_size=g)
    fused = quant_matmul(x, qw, jnp.asarray(scales), jnp.asarray(zeros),
                         bits=4, group_size=g, epilogue_add=res)
    expect = (base.astype(jnp.float32) +
              res.astype(jnp.float32)).astype(base.dtype)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(expect, np.float32),
                               atol=2e-2, rtol=2e-2)
    # Prologue + epilogue together (rmsnorm in, residual out).
    aux = jnp.asarray(rng.random((k,)), jnp.float32)
    both = quant_matmul(x, qw, jnp.asarray(scales), jnp.asarray(zeros),
                        bits=4, group_size=g, prologue="rmsnorm",
                        aux=aux, epilogue_add=res)
    pro = quant_matmul(x, qw, jnp.asarray(scales), jnp.asarray(zeros),
                       bits=4, group_size=g, prologue="rmsnorm", aux=aux)
    expect2 = (pro.astype(jnp.float32) +
               res.astype(jnp.float32)).astype(pro.dtype)
    np.testing.assert_allclose(np.asarray(both, np.float32),
                               np.asarray(expect2, np.float32),
                               atol=2e-2, rtol=2e-2)


class TestPrologueScratchTiling:
    """The hoisted-activation scratch (computed at n-step 0, reused
    across the n grid dim — docs/PERF_NOTES.md round-2) must stay
    correct across multiple m-blocks and k-blocks."""

    @pytest.mark.parametrize("prologue", ["silu_mul", "rmsnorm"])
    def test_prologue_multi_block_grid(self, prologue):
        import numpy as np
        import jax.numpy as jnp
        from nmvllm_tpu.ops.quant_matmul import (apply_prologue_jnp,
                                                 pack_weights, quant_matmul)
        rng = np.random.default_rng(3)
        M, K, N, G = 48, 512, 512, 128
        w_int = rng.integers(0, 16, (K, N))
        qw = pack_weights(jnp.asarray(w_int), 4, G)
        scales = jnp.asarray(np.abs(rng.normal(0, 0.02, (K // G, N)))
                             + 1e-3, jnp.float32)
        zeros = jnp.full((K // G, N), 8, jnp.int32)
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
        aux = (jnp.asarray(np.abs(rng.normal(1, 0.1, (K,))), jnp.float32)
               if prologue == "rmsnorm"
               else jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32))
        # Force multi-block m (block_m=16 -> 3 m-blocks), multi-block n
        # (block_n=128 -> 4 n-steps) and, for silu, multi-block k
        # (block_k=256 -> 2 k-steps): the act scratch must be recomputed
        # per (m, k) block at n-step 0 and reused for n-step > 0.
        kw = dict(bits=4, group_size=G, prologue=prologue, aux=aux,
                  eps=1e-5, block_m=16, block_n=128)
        if prologue != "rmsnorm":
            kw["block_k"] = 256
        fused = quant_matmul(x, qw, scales, zeros, **kw)
        pre = apply_prologue_jnp(prologue, x, aux, 1e-5)
        ref = quant_matmul(pre, qw, scales, zeros, bits=4, group_size=G)
        np.testing.assert_allclose(np.asarray(fused, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.08, atol=0.08)


def test_w4_vmem_budget_block_choice():
    """Regression pin for the round-4 VMEM-OOM fix: decode-sized calls
    keep the proven (bm, bn) blocks, prefill-sized calls must shrink
    below the measured 16MB scoped-VMEM cliff (bm=256 prologue configs
    OOMed at 16.4-17.5M on hardware)."""
    from nmvllm_tpu.ops.quant_matmul import (_W4_VMEM_BUDGET,
                                             _w4_vmem_estimate)

    def choose(m, k, n, prologue, bk, bn=1024):
        bm = min(((m + 15) // 16) * 16, 256)

        def fits(bm_, bn_):
            return _w4_vmem_estimate(bm_, bn_, bk, k, 128, 2, 2,
                                     prologue, False) <= _W4_VMEM_BUDGET
        while not fits(bm, bn) and bn > 256 and n % (bn // 2) == 0:
            bn //= 2
        while not fits(bm, bn) and bm > 16:
            bm = max(16, ((bm // 2 + 15) // 16) * 16)
        return bm, bn

    # Decode configs: unchanged (these are the benchmarked-fast blocks).
    assert choose(72, 4096, 28672, "rmsnorm", 4096) == (80, 1024)
    assert choose(72, 4096, 6144, "rmsnorm", 4096) == (80, 1024)
    assert choose(72, 14336, 4096, "silu_mul", 2048) == (80, 1024)
    # Prefill-sized PLAIN calls (the prologue falls back to jnp for
    # m>128) must also fit, with shrunken blocks where needed.
    for m, k, n, bk in [(2048, 4096, 6144, 2048),
                        (2048, 4096, 28672, 2048),
                        (2048, 14336, 4096, 2048),
                        (8192, 4096, 6144, 2048)]:
        bm, bn = choose(m, k, n, None, bk)
        assert _w4_vmem_estimate(bm, bn, bk, k, 128, 2, 2, None,
                                 False) <= _W4_VMEM_BUDGET


def test_w4_prologue_falls_back_at_prefill_m():
    """m>128 with a prologue must produce the same numbers as the fused
    decode form (prologue applied as jnp + plain kernel)."""
    import jax
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import (quant_matmul,
                                             quant_matmul_reference,
                                             quantize_weights_to_packed,
                                             apply_prologue_jnp)
    rng = jax.random.PRNGKey(3)
    k, n = 256, 256
    w = jax.random.normal(rng, (n, k), jnp.float32) * 0.02
    qw, s, z = quantize_weights_to_packed(w, 4, 128, symmetric=False)
    x = jax.random.normal(rng, (192, k), jnp.float32)  # m > 128
    aux = jnp.ones((k,), jnp.float32)
    y = quant_matmul(x, qw, s, z, bits=4, group_size=128,
                     prologue="rmsnorm", aux=aux, eps=1e-6)
    ref = quant_matmul_reference(
        apply_prologue_jnp("rmsnorm", x, aux, 1e-6), qw, s, z,
        bits=4, group_size=128)
    assert jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9) \
        < 2e-2


class TestW4A8Packed:
    """Round-5 W4A8 fast path: group-half byte-lane packing, in-kernel
    int8 unpack with group multipliers, one full-depth int8 MXU dot
    (bench_w4a8_v5.py measured 0.43x the exact kernel's time)."""

    def _mk(self, m, k, n, sym, seed=0):
        from nmvllm_tpu.ops.quant_matmul import (
            quantize_weights_to_packed, requantize_grouped_to_a8p)
        rng = jax.random.PRNGKey(seed)
        w = jax.random.normal(rng, (n, k), jnp.float32) * 0.02
        qw, s, z = quantize_weights_to_packed(w, 4, 128, symmetric=sym)
        a8 = requantize_grouped_to_a8p(qw, s, z, group_size=128, k=k)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (m, k),
                              jnp.bfloat16)
        return (qw, s, z), a8, x

    def test_pack_roundtrip(self):
        from nmvllm_tpu.ops.quant_matmul import (pack_weights_a8p,
                                                 unpack_weights_a8p)
        v = np.random.default_rng(0).integers(0, 16, size=(512, 256))
        rt = unpack_weights_a8p(pack_weights_a8p(jnp.asarray(v), 128),
                                128, 512)
        np.testing.assert_array_equal(np.asarray(rt), v)

    @pytest.mark.parametrize("m,sym", [(8, True), (72, False)])
    def test_kernel_matches_reference(self, m, sym):
        from nmvllm_tpu.ops.quant_matmul import (
            quant_matmul_a8p, quant_matmul_a8p_reference)
        _, (aqw, mult, sc, zms), x = self._mk(m, 1024, 512, sym)
        ref = quant_matmul_a8p_reference(x, aqw, mult, sc, zms,
                                         group_size=128)
        got = quant_matmul_a8p(x, aqw, mult, sc, zms, group_size=128)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        assert err / scale < 2e-2, (err, scale)

    def test_close_to_exact_dequant(self):
        """The requantized scheme must track the exact dequant path to
        quantization-error level (int8 activations + regridded group
        scales; bounded by the cert harness at real geometry)."""
        from nmvllm_tpu.ops.quant_matmul import (quant_matmul,
                                                 quant_matmul_a8p)
        (qw, s, z), (aqw, mult, sc, zms), x = self._mk(32, 1024, 512,
                                                       False)
        exact = quant_matmul(x, qw, s, z, bits=4, group_size=128,
                             symmetric=False)
        got = quant_matmul_a8p(x, aqw, mult, sc, zms, group_size=128)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    exact.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(exact.astype(jnp.float32)))) + 1e-9
        assert err / scale < 0.08, (err, scale)

    def test_prologue_and_residual(self):
        from nmvllm_tpu.ops.quant_matmul import (
            quant_matmul_a8p, quant_matmul_a8p_reference,
            apply_prologue_jnp)
        _, (aqw, mult, sc, zms), x = self._mk(16, 512, 256, True)
        aux = jnp.ones((512,), jnp.float32) * 1.5
        res = jax.random.normal(jax.random.PRNGKey(3), (16, 256),
                                jnp.float32)
        got = quant_matmul_a8p(x, aqw, mult, sc, zms, group_size=128,
                               prologue="rmsnorm", aux=aux,
                               epilogue_add=res)
        xn = apply_prologue_jnp("rmsnorm", x, aux, 1e-6)
        ref = quant_matmul_a8p_reference(xn, aqw, mult, sc, zms,
                                         group_size=128)
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) -
            (ref.astype(jnp.float32) + res))))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        assert err / scale < 3e-2, (err, scale)

    def test_method_level(self, monkeypatch):
        """wNa16 'packed' mode end-to-end through the method seam."""
        monkeypatch.setenv("NMVLLM_INT4_A8", "packed")
        from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod
        meth = WNA16LinearMethod(4, 128, symmetric=True)
        assert meth.a8_mode == "packed"
        p = meth.create_weights(jax.random.PRNGKey(0), 512, 256,
                                jnp.float32)
        assert set(p) == {"qweight", "mult", "scales", "zeros"}
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 512),
                              jnp.float32)
        y = meth.apply(p, x)
        assert y.shape == (4, 256)
        assert not bool(jnp.isnan(y).any())
        assert float(jnp.std(y.astype(jnp.float32))) > 0.1
