"""pathtracing_tpu: a TPU-native differentiable path tracer in JAX/Pallas.

Brand-new implementation with the capabilities of the reference C++20 CPU
tracer (marko176/PathTracing): TLAS/BLAS SAH BVH, microfacet GGX materials
with VNDF sampling, MIS+NEE, homogeneous media, thin-lens cameras,
stratified sampling, reconstruction-filtered film — re-designed as
vectorized wavefront kernels over device meshes.
"""
from .scene.builder import SceneBuilder  # noqa: F401
from .scene.types import SceneMeta  # noqa: F401
from .integrators.path import RenderConfig  # noqa: F401
from .integrators.render import render, render_image  # noqa: F401
from .core.rng import SamplerConfig  # noqa: F401
from .core import filters  # noqa: F401

__version__ = "0.1.0"
