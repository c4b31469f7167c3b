from . import optim, losses  # noqa: F401
