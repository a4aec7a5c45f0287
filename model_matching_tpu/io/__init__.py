from . import image, ply  # noqa: F401
