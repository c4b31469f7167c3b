from .options import Options, load_options, parse_arguments, override_options, set_options  # noqa: F401
