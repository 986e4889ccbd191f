from .loader import native_build_bvh, native_available  # noqa: F401
