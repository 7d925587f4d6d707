from .checkpoint import (  # noqa: F401
    load_checkpoint,
    restore_params,
    save_checkpoint,
    select_weights,
)
from .jsonl import JsonlLogger  # noqa: F401
