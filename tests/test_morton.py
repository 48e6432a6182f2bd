"""Bit-exact Morton oracles (SURVEY §4: Morton encode/decode vs a scalar
reference, semantics of reference morton.hpp:21-37)."""

import numpy as np
import jax.numpy as jnp

from chad_tsdf_tpu.ops import morton


def scalar_encode63(x, y, z):
    """Scalar reference: libmorton bit layout, bias 1<<20 (morton.hpp:24-28)."""
    ux, uy, uz = (int(x) + (1 << 20), int(y) + (1 << 20), int(z) + (1 << 20))
    out = 0
    for i in range(21):
        out |= ((ux >> i) & 1) << (3 * i)
        out |= ((uy >> i) & 1) << (3 * i + 1)
        out |= ((uz >> i) & 1) << (3 * i + 2)
    return out


def test_encode63_matches_scalar():
    rng = np.random.default_rng(0)
    coords = rng.integers(-(1 << 20), 1 << 20, size=(500, 3), dtype=np.int32)
    codes = morton.np_encode63(coords)
    for c, code in zip(coords, codes):
        assert int(code) == scalar_encode63(*c)


def test_encode63_roundtrip():
    rng = np.random.default_rng(1)
    coords = rng.integers(-(1 << 20), 1 << 20, size=(1000, 3), dtype=np.int32)
    back = morton.np_decode63(morton.np_encode63(coords))
    np.testing.assert_array_equal(back, coords)


def test_block_key_roundtrip_device():
    rng = np.random.default_rng(2)
    b = rng.integers(0, 1024, size=(1000, 3), dtype=np.int32)
    key = morton.encode_block(jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1]),
                              jnp.asarray(b[:, 2]))
    bx, by, bz = morton.decode_block(key)
    np.testing.assert_array_equal(np.asarray(bx), b[:, 0])
    np.testing.assert_array_equal(np.asarray(by), b[:, 1])
    np.testing.assert_array_equal(np.asarray(bz), b[:, 2])
    assert int(jnp.max(key)) < (1 << 30)


def test_offset_roundtrip():
    o = np.arange(8, dtype=np.int32)
    ox, oy, oz = np.meshgrid(o, o, o, indexing="ij")
    off = morton.encode_offset(jnp.asarray(ox.ravel()), jnp.asarray(oy.ravel()),
                               jnp.asarray(oz.ravel()))
    rx, ry, rz = morton.decode_offset(off)
    np.testing.assert_array_equal(np.asarray(rx), ox.ravel())
    np.testing.assert_array_equal(np.asarray(ry), oy.ravel())
    np.testing.assert_array_equal(np.asarray(rz), oz.ravel())


def test_block_offset_nests_in_world63():
    """(block key, offset) must nest exactly inside the 63-bit world code:
    encode63(block*8+off) == world_block_morton << 9 | offset_morton."""
    rng = np.random.default_rng(3)
    blocks = rng.integers(-500, 500, size=(200, 3), dtype=np.int32)
    offs = rng.integers(0, 8, size=(200, 3), dtype=np.int32)
    vox = blocks * 8 + offs
    world = morton.np_encode63(vox)

    origin = np.array([-512, -512, -512], np.int32)
    local_blocks = blocks - origin  # in [12, 1012) ⊂ [0, 1024)
    assert (local_blocks >= 0).all() and (local_blocks < 1024).all()
    bkey = np.asarray(morton.encode_block(
        jnp.asarray(local_blocks[:, 0]), jnp.asarray(local_blocks[:, 1]),
        jnp.asarray(local_blocks[:, 2])))
    okey = np.asarray(morton.encode_offset(
        jnp.asarray(offs[:, 0]), jnp.asarray(offs[:, 1]),
        jnp.asarray(offs[:, 2])))
    wb = morton.np_block_key_to_world63(bkey, origin, block_bits=10)
    np.testing.assert_array_equal((wb << np.uint64(9)) | okey.astype(np.uint64),
                                  world)


def test_key_order_matches_world_order():
    """Sorting by (local block key, offset) must equal sorting by the global
    63-bit Morton code (locality/compatibility invariant)."""
    rng = np.random.default_rng(4)
    vox = rng.integers(-4000, 4000, size=(2000, 3), dtype=np.int32)
    world = morton.np_encode63(vox)
    origin = np.array([-512, -512, -512], np.int32)
    lb = (vox >> 3) - origin
    bkey = np.asarray(morton.encode_block(jnp.asarray(lb[:, 0]),
                                          jnp.asarray(lb[:, 1]),
                                          jnp.asarray(lb[:, 2])))
    okey = np.asarray(morton.encode_offset(jnp.asarray(vox[:, 0] & 7),
                                           jnp.asarray(vox[:, 1] & 7),
                                           jnp.asarray(vox[:, 2] & 7)))
    order_local = np.lexsort((okey, bkey))
    order_world = np.argsort(world, kind="stable")
    np.testing.assert_array_equal(world[order_local], world[order_world])
