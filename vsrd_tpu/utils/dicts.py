"""Attribute-access dictionaries (config ergonomics).

Parity with the reference's `Dict`/`DefaultDict`
(`/root/reference/vsrd/utils.py` attr-dicts): plain dict subclasses whose
items are also attributes, recursively applied.
"""

from __future__ import annotations

import collections


class Dict(dict):
    """dict with attribute access (d.key == d['key'])."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as error:
            raise AttributeError(name) from error

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as error:
            raise AttributeError(name) from error

    @classmethod
    def apply(cls, obj):
        """Recursively convert nested dicts/lists to attr-dicts."""
        if isinstance(obj, dict):
            return cls({k: cls.apply(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(cls.apply(v) for v in obj)
        return obj


class DefaultDict(collections.defaultdict):
    """defaultdict with attribute access."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return self[name]

    def __setattr__(self, name, value):
        self[name] = value
