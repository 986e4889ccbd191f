from . import math, rng, filters, tonemap, bsdf, phase, medium  # noqa: F401
