from .mesh import make_mesh, render_sharded, train_step_sharded  # noqa: F401
