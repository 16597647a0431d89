from .jsonc import read_json, write_json, loads as loads_jsonc  # noqa: F401
from .logging_setup import setup_logging  # noqa: F401
from .util import (  # noqa: F401
    device_put_tree,
    ensure_dir,
    extract_arrays,
    inf_loop,
    is_image_like_batch,
    prepare_devices,
    to_numpy_tree,
)
from .writer import TensorboardWriter  # noqa: F401
