"""Quantization oracle (SURVEY §4): 8-bit TSDF codec round trip within
trunc/127, bit-exact vs the reference's cluster.hpp:13-52 semantics."""

import numpy as np
import jax.numpy as jnp

from chad_tsdf_tpu.ops import codec


def ref_encode(sd, trunc):
    """Scalar port of cluster.hpp:20-27 (C float->uint truncation)."""
    s = max(-1.0, min(1.0, sd * (1.0 / trunc)))
    return int(np.float32(np.float32(s) * 127.0 + 127.0))  # trunc toward zero


def test_encode_matches_reference_scalar():
    trunc = 0.1
    rng = np.random.default_rng(0)
    sds = np.concatenate([
        rng.uniform(-0.2, 0.2, 500),
        np.array([-0.1, 0.1, 0.0, -0.15, 0.15, 0.05, -0.05])]).astype(np.float32)
    got = np.asarray(codec.encode_sd(jnp, jnp.asarray(sds), trunc))
    want = np.array([ref_encode(s, trunc) for s in sds], np.uint8)
    np.testing.assert_array_equal(got, want)
    assert got.max() <= 254  # 0xff reserved for empty


def test_roundtrip_tolerance():
    trunc = 0.1
    sds = np.linspace(-0.1, 0.1, 1001).astype(np.float32)
    q = codec.encode_sd(jnp, jnp.asarray(sds), trunc)
    back = np.asarray(codec.decode_sd(jnp, q, trunc))
    assert np.abs(back - sds).max() <= trunc / 127 + 1e-6


def test_weight_clamp():
    w = jnp.asarray([0.0, 1.0, 200.0, 254.0, 255.0, 1000.0])
    q = np.asarray(codec.encode_weight(jnp, w))
    np.testing.assert_array_equal(q, [0, 1, 200, 254, 254, 254])
    assert (q != codec.EMPTY).all()


def test_cluster_pack_unpack():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 256, size=(64, 8), dtype=np.uint8)
    words = codec.pack_cluster_u64(np, vals)
    back = codec.unpack_cluster_u64(np, words)
    np.testing.assert_array_equal(back, vals)
    # leaf i occupies bits [8i, 8i+8) (cluster.hpp:28)
    one = np.zeros((1, 8), np.uint8)
    one[0, 3] = 0xAB
    assert codec.pack_cluster_u64(np, one)[0] == np.uint64(0xAB) << np.uint64(24)
