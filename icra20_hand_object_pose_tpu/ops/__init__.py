from . import camera, preprocess  # noqa: F401
