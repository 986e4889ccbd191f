from .builder import SceneBuilder  # noqa: F401
from .types import SceneMeta  # noqa: F401
