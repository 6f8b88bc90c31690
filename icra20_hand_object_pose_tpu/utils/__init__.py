from . import config, meshio, se3  # noqa: F401
