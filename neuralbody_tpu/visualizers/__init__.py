from . import visualizers  # noqa: F401  (registers plugins)
