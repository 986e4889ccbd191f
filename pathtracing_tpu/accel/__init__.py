from .build import build_bvh, BVHMeta  # noqa: F401
