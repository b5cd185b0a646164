from . import config, constants, mesh, precision  # noqa: F401
