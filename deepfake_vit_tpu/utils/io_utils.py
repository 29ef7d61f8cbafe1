"""IO + checkpoint utilities.

Behavioral parity with reference ``src/utils/io_utils.py:15-370``:
json/yaml/pickle round-trips, checkpoint save with ``best_model`` copy and
mtime-based rotation keeping the newest ``max_keep``, config load/save
dispatching on suffix, parameter counting, and append-aware metrics JSON.

TPU-native differences: checkpoints hold JAX pytrees (params / opt_state /
batch_stats), serialized host-side via flax msgpack after `jax.device_get`,
so they are layout- and sharding-agnostic and restore onto any mesh.
"""

from __future__ import annotations

import json
import pickle
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np
import yaml
from flax import serialization

PathLike = Union[str, Path]


# ---------------------------------------------------------------------------
# Basic file formats
# ---------------------------------------------------------------------------

def ensure_dir(path: PathLike) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def get_project_root() -> Path:
    """Repo root = two levels above this package."""
    return Path(__file__).resolve().parents[2]


def load_json(path: PathLike) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def save_json(data: Any, path: PathLike, indent: int = 2) -> None:
    path = Path(path)
    ensure_dir(path.parent)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=indent, ensure_ascii=False, default=_json_default)


def _json_default(obj: Any) -> Any:
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, Path):
        return str(obj)
    raise TypeError(f"not JSON serializable: {type(obj)}")


def load_yaml(path: PathLike) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def save_yaml(data: Any, path: PathLike) -> None:
    path = Path(path)
    ensure_dir(path.parent)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(data, f, sort_keys=False, allow_unicode=True)


def load_pickle(path: PathLike) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(data: Any, path: PathLike) -> None:
    path = Path(path)
    ensure_dir(path.parent)
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_config(path: PathLike) -> Dict[str, Any]:
    """Load a config file, dispatching on suffix (.yaml/.yml/.json)."""
    path = Path(path)
    if path.suffix in (".yaml", ".yml"):
        return load_yaml(path)
    if path.suffix == ".json":
        return load_json(path)
    raise ValueError(f"unsupported config format: {path.suffix}")


def save_config(config: Dict[str, Any], path: PathLike) -> None:
    path = Path(path)
    if path.suffix in (".yaml", ".yml"):
        save_yaml(config, path)
    elif path.suffix == ".json":
        save_json(config, path)
    else:
        raise ValueError(f"unsupported config format: {path.suffix}")


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

CKPT_SUFFIX = ".ckpt"
BEST_NAME = f"best_model{CKPT_SUFFIX}"


def _to_host(tree: Any) -> Any:
    """Device → host, preserving structure; non-arrays pass through."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)) if isinstance(x, (jax.Array, np.ndarray)) else x,
        tree,
    )


def save_checkpoint(
    state: Dict[str, Any],
    save_dir: PathLike,
    filename: Optional[str] = None,
    is_best: bool = False,
    max_keep: int = 5,
) -> Path:
    """Save a checkpoint with best-copy + rotation semantics.

    ``state`` is a dict of pytrees + metadata (epoch, params, opt_state,
    batch_stats, metrics, config, ...). When ``is_best``, a copy named
    ``best_model.ckpt`` is written alongside. Rotation keeps the newest
    ``max_keep`` epoch checkpoints by mtime (best copy exempt), matching
    reference ``io_utils.py:135-182``.
    """
    save_dir = ensure_dir(save_dir)
    epoch = state.get("epoch", 0)
    if filename is None:
        filename = f"checkpoint_epoch_{epoch:04d}{CKPT_SUFFIX}"
    path = save_dir / filename

    host_state = _to_host(state)
    blob = serialization.msgpack_serialize(_msgpackable(host_state))
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    tmp.replace(path)

    if is_best:
        shutil.copy2(path, save_dir / BEST_NAME)

    _rotate_checkpoints(save_dir, max_keep)
    return path


def _msgpackable(tree: Any) -> Any:
    """Coerce a pytree into msgpack-friendly types (tuples → lists)."""
    if isinstance(tree, dict):
        return {str(k): _msgpackable(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_msgpackable(v) for v in tree]
    if isinstance(tree, Path):
        return str(tree)
    if tree is None or isinstance(tree, (bool, int, float, str, bytes, np.ndarray)):
        return tree
    if isinstance(tree, (np.integer,)):
        return int(tree)
    if isinstance(tree, (np.floating,)):
        return float(tree)
    return str(tree)


def _rotate_checkpoints(save_dir: Path, max_keep: int) -> None:
    if max_keep is None or max_keep <= 0:
        return
    ckpts = sorted(
        (p for p in save_dir.glob(f"checkpoint_epoch_*{CKPT_SUFFIX}")),
        key=lambda p: p.stat().st_mtime,
    )
    for stale in ckpts[:-max_keep] if len(ckpts) > max_keep else []:
        stale.unlink(missing_ok=True)


def load_checkpoint(path: PathLike) -> Dict[str, Any]:
    """Load a checkpoint saved by :func:`save_checkpoint`."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.msgpack_restore(blob)


def latest_checkpoint(save_dir: PathLike) -> Optional[Path]:
    save_dir = Path(save_dir)
    if not save_dir.is_dir():
        return None
    ckpts = sorted(
        save_dir.glob(f"checkpoint_epoch_*{CKPT_SUFFIX}"),
        key=lambda p: p.stat().st_mtime,
    )
    return ckpts[-1] if ckpts else None


# ---------------------------------------------------------------------------
# Model info
# ---------------------------------------------------------------------------

def count_parameters(params: Any, trainable_only: bool = True) -> int:
    """Total number of scalar parameters in a pytree."""
    del trainable_only  # JAX params pytrees are all trainable by construction
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(np.shape(leaf)) for leaf in leaves))


def print_model_info(params: Any, name: str = "model", logger=None) -> Dict[str, Any]:
    n = count_parameters(params)
    info = {
        "name": name,
        "total_params": n,
        "size_mb_fp32": n * 4 / 1024 / 1024,
        "size_mb_bf16": n * 2 / 1024 / 1024,
    }
    msg = (
        f"{name}: {n:,} params "
        f"({info['size_mb_fp32']:.1f} MB fp32 / {info['size_mb_bf16']:.1f} MB bf16)"
    )
    (logger.info if logger else print)(msg)
    return info


def save_metrics(metrics: Dict[str, Any], path: PathLike, append: bool = True) -> None:
    """Append-aware metrics JSON (list-of-records), per reference semantics."""
    path = Path(path)
    records = []
    if append and path.exists():
        try:
            existing = load_json(path)
            records = existing if isinstance(existing, list) else [existing]
        except (json.JSONDecodeError, OSError):
            records = []
    entry = dict(metrics)
    entry.setdefault("timestamp", time.time())
    records.append(entry)
    save_json(records, path)
