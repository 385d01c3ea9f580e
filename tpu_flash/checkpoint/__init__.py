"""Checkpoint / resume subsystem.

The reference has no serialization anywhere in its tree (SURVEY.md §5:
"Checkpoint / resume: Absent"); this package provides the TPU-native
equivalent the build plan requires: orbax-backed weight checkpoints for the
BASELINE model shapes, a keep-N training checkpoint manager, KV-cache
snapshot/restore for the decode engine, and an HF-Llama weight importer.
"""

from tpu_flash.checkpoint.convert import (
    load_hf_dir,
    model_config_from_hf,
    params_from_hf_llama,
)
from tpu_flash.checkpoint.store import (
    TrainCheckpointManager,
    restore_dp_engine,
    restore_engine,
    restore_params,
    save_params,
    snapshot_dp_engine,
    snapshot_engine,
)

__all__ = [
    "TrainCheckpointManager",
    "load_hf_dir",
    "model_config_from_hf",
    "params_from_hf_llama",
    "restore_dp_engine",
    "restore_engine",
    "restore_params",
    "save_params",
    "snapshot_dp_engine",
    "snapshot_engine",
]
