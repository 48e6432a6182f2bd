from . import accumulate, codec, dda, morton, normals, segops  # noqa: F401
