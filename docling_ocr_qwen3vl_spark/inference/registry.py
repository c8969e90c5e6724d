"""Per-executor-process singleton registry for expensive decode backends.

Spark analog of the reference's shared-model registry
(_model_registry.py:20,26-32,54-76): the reference keys one loaded
Qwen3-VL model per (model_repo_id, device) behind a double-checked lock so
OCR/layout/table stages share ~5-8 GB of weights.  Here the registry lives at
module level inside each PYTHON WORKER process, so every Arrow batch that a
``mapInPandas``/pandas UDF task feeds through re-uses the same loaded backend
— one model per executor Python worker, exactly the "per-executor model
singleton" the north-star requires.  On a GPU cluster you pin one task per
GPU with ``spark.task.resource.gpu.amount=1`` and this registry guarantees a
single resident model per worker.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

_LOCK = threading.Lock()
_REGISTRY: dict[tuple, Any] = {}


def get_or_create(key: tuple, factory: Callable[[], Any]) -> Any:
    """Double-checked-lock singleton lookup (parity: _model_registry.py:54-76)."""
    existing = _REGISTRY.get(key)
    if existing is not None:
        return existing
    with _LOCK:
        existing = _REGISTRY.get(key)
        if existing is None:
            existing = factory()
            _REGISTRY[key] = existing
        return existing


def registry_size() -> int:
    return len(_REGISTRY)


def clear() -> None:
    """Test hook."""
    with _LOCK:
        _REGISTRY.clear()
