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


# -------------------------------------------------------------- msgpack tier
# Single-file artifacts for the shipped pretrained weights: flax msgpack is
# one committable binary per model (orbax writes a directory tree, awkward to
# version in git). ``like`` supplies the pytree structure on load.
def save_msgpack(path: str, params: Any) -> str:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(params)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_msgpack(path: str, like: Any, migrate=None) -> Any:
    """Restore ``like``-shaped params from a msgpack file. ``migrate``, if
    given, receives the raw restored state dict and may rewrite legacy key
    layouts before it is matched against ``like``."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if migrate is None:
        return serialization.from_bytes(like, data)
    state = serialization.msgpack_restore(data)
    return serialization.from_state_dict(like, migrate(state))


def load_msgpack_if_exists(path: str, like: Any) -> Optional[Any]:
    if not os.path.exists(path):
        return None
    return load_msgpack(path, like)
