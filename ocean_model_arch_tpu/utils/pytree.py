"""Pytree dataclass helper: array fields are pytree leaves, fields marked
``static=True`` in metadata are aux data (hashable, trace-time constants)."""

from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    """Declare a non-leaf (aux/static) dataclass field."""
    md = dict(kwargs.pop("metadata", {}) or {})
    md["static"] = True
    return dataclasses.field(metadata=md, **kwargs)


def pytree_dataclass(cls):
    """Decorator: dataclass registered as a JAX pytree."""
    cls = dataclasses.dataclass(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(cls, data_fields, meta_fields)
    return cls
