from . import vech  # noqa: F401
