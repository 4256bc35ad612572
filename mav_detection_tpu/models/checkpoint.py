"""Model checkpoint save/load via orbax.

The reference has no model checkpointing (weights lived in a docker sidecar,
referenced by run-id strings in settings.json — SURVEY.md §5); here model
state is a first-class artifact: ``save(path, params)`` / ``load(path)``
round-trips any pytree, and the artifact-cache idiom (skip-if-exists) carries
over from the data layer.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, params: Any, force: bool = True) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=force)
    ckptr.wait_until_finished()
    return path


def load(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


def load_if_exists(path: str, like: Optional[Any] = None) -> Optional[Any]:
    if not os.path.exists(path):
        return None
    return load(path, like)
