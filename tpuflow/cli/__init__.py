from tpuflow.cli.parser import build_parser, parse_args_to_options  # noqa: F401
