from .cli import run_cli  # noqa: F401
from .jax_setup import setup_jax  # noqa: F401
