"""8-bit TSDF / weight quantization codec.

Bit-for-bit reproduction of the reference LeafCluster codec
(reference: include/chad/cluster.hpp:13-69):

* signed distance: normalized by the truncation distance into [-1, 1],
  scaled by 127 and offset by +127, truncated to an integer in [0, 254].
  ``0xff`` is the reserved "empty leaf" sentinel (cluster.hpp:29-31).
* weight: stored as uint8; the reference's ``Weights::set`` clamps with
  ``std::min`` (cluster.hpp:59).  (Submap::finalize's ``std::max`` clamp at
  submap.hpp:92-93 is a known bug — always 255 — which we do NOT replicate;
  the clear intent is ``min``.)

Works under jax.numpy and plain numpy (both expose clip/floor/where).
"""

from __future__ import annotations

SD_RANGE_ABS = 127          # std::numeric_limits<uint8_t>::max() / 2
EMPTY = 255                 # 0xff sentinel


def encode_sd(xp, signed_distance, sdf_trunc: float):
    """float signed distance -> uint8 quantized code in [0, 254].

    Matches cluster.hpp:20-27: clamp(sd/trunc, -1, 1) * 127 + 127, then a
    C-style float->int cast.  The value is non-negative, so truncation
    toward zero equals floor.
    """
    sd = xp.clip(signed_distance * (1.0 / sdf_trunc), -1.0, 1.0)
    q = xp.floor(sd * float(SD_RANGE_ABS) + float(SD_RANGE_ABS))
    return q.astype(xp.uint8)


def decode_sd(xp, q, sdf_trunc: float):
    """uint8 code -> float signed distance (cluster.hpp:41-50).

    Does not special-case EMPTY; mask with ``q != EMPTY`` at the call site
    like the reference's ``try_get``.
    """
    sd = q.astype(xp.float32) - float(SD_RANGE_ABS)
    return sd * (1.0 / float(SD_RANGE_ABS)) * sdf_trunc


def encode_weight(xp, weight):
    """float/int accumulated weight -> uint8, clamped to [0, 254].

    254 (not 255) because 0xff is the empty sentinel shared with the TSDF
    view; the reference would store min(w, 255) which collides with the
    sentinel for w >= 255 — a latent defect we avoid by capping at 254.
    """
    return xp.clip(weight, 0, 254).astype(xp.uint8)


def pack_cluster_u64(np, bytes8):
    """(..., 8) uint8 leaf values -> (...,) uint64 cluster words (host).

    Leaf ``i`` occupies bits [8i, 8i+8) (cluster.hpp:28,33), with
    ``i = x + 2y + 4z`` — the low 3 bits of the voxel's Morton code.
    """
    v = bytes8.astype(np.uint64)
    out = np.zeros(bytes8.shape[:-1], dtype=np.uint64)
    for i in range(8):
        out |= v[..., i] << np.uint64(8 * i)
    return out


def unpack_cluster_u64(np, words):
    """(...,) uint64 cluster words -> (..., 8) uint8 leaf values (host)."""
    out = np.empty(words.shape + (8,), dtype=np.uint8)
    for i in range(8):
        out[..., i] = ((words >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.uint8)
    return out
