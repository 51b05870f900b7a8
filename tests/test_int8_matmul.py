"""Weight-only int8 matmul kernel (vitx/kernels/int8_matmul.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.kernels.int8_matmul import int8_matmul_reference, quant_matmul
from vitx.quant import quantize_leaf


def _operands(key, m, k, n, dtype=jnp.float32):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (m, k), dtype)
    w = np.asarray(jax.random.normal(kw, (k, n)))
    q, s = quantize_leaf(w, "head/w1")               # (k,n) int8, (1,n)
    return x, jnp.asarray(q), jnp.asarray(s.reshape(-1))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference_aligned(dtype):
    """128-aligned K/N takes the Pallas path; must match XLA dequant."""
    x, q, s = _operands(0, 16, 256, 384, dtype)
    got = quant_matmul(x, q, s)
    want = int8_matmul_reference(x, q, s)
    assert got.dtype == x.dtype
    # kernel computes (x@q)*s, reference x@(q*s): op order differs
    tol = 5e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_m_padding_and_batch_dims():
    """Ragged M (not a sublane multiple) and leading batch dims both
    round-trip through the padding logic."""
    x, q, s = _operands(1, 5, 128, 256)
    got = quant_matmul(x, q, s)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(int8_matmul_reference(x, q, s)),
                               rtol=1e-5, atol=1e-5)
    xb = x.reshape(1, 5, 128).repeat(3, axis=0)
    got_b = quant_matmul(xb, q, s)
    assert got_b.shape == (3, 5, 256)
    np.testing.assert_allclose(np.asarray(got_b[2]), np.asarray(got),
                               rtol=1e-6, atol=1e-6)


def test_unaligned_shapes_fall_back():
    """K or N not 128-aligned must still give the right answer (XLA path)."""
    x, q, s = _operands(2, 4, 96, 100)
    got = quant_matmul(x, q, s)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(int8_matmul_reference(x, q, s)),
                               rtol=1e-6, atol=1e-6)


def test_quantized_linear_is_close_to_float():
    """End-to-end error vs the FLOAT weight stays in the int8 regime."""
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (8, 256))
    w = np.asarray(jax.random.normal(kw, (256, 512)))
    q, s = quantize_leaf(w, "head/w1")
    got = np.asarray(quant_matmul(x, jnp.asarray(q),
                                  jnp.asarray(s.reshape(-1))))
    want = np.asarray(x) @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_quant_matmul_dp_mesh_matches_single_device():
    """The custom_partitioning rule shards rows over the mesh; results
    must match the single-device kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    x, q, s = _operands(5, 64, 256, 384)
    want = quant_matmul(x, q, s)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    qs = jax.device_put(q, NamedSharding(mesh, P()))
    ss = jax.device_put(s, NamedSharding(mesh, P()))
    got = jax.jit(quant_matmul)(xs, qs, ss)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_shape_validation():
    x, q, s = _operands(4, 4, 128, 256)
    with pytest.raises(ValueError, match="contraction"):
        quant_matmul(x[:, :64], q, s)
    with pytest.raises(ValueError, match="channels"):
        quant_matmul(x, q, s[:-1])
