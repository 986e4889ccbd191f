from .path import RenderConfig, trace  # noqa: F401
from .render import render, render_tile, render_image  # noqa: F401
