from .parse_config import ConfigParser, CustomArgs  # noqa: F401
