from . import cones, lanczos, linop, tri  # noqa: F401
