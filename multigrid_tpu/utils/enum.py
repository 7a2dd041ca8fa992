"""Extensible indexed enumerations.

TPU-native equivalent of the reference's aenum-based ``IndexedEnum``
(reference: multigrid/utils/enum.py:42-89). Built on the stdlib ``enum``
module plus a small ``extend_enum`` implementation, since ``aenum`` is not a
dependency of this framework. Each member has a stable integer index — the
index order *is* the wire format used by the dense grid encodings, so it must
never change for the core types.
"""

from __future__ import annotations

import enum
import functools
from typing import Any

import numpy as np


def extend_enum(cls: type[enum.Enum], name: str, value: Any) -> enum.Enum:
    """Dynamically add a new member to an existing Enum class.

    Minimal equivalent of ``aenum.extend_enum`` covering the needs of
    :meth:`IndexedEnum.add_item` (reference multigrid/utils/enum.py:62).
    """
    if name in cls._member_map_:
        raise ValueError(f"member {name!r} already exists in {cls.__name__}")

    member_type = cls._member_type_
    if member_type is object:
        member = object.__new__(cls)
    else:
        member = member_type.__new__(cls, value)
    member._name_ = name
    member._value_ = value
    # Bypass EnumMeta.__setattr__, which forbids assigning members.
    type.__setattr__(cls, name, member)
    cls._member_map_[name] = member
    cls._member_names_.append(name)
    try:
        cls._value2member_map_[value] = member
    except TypeError:
        pass
    return member


@functools.cache
def _enum_array(enum_cls) -> np.ndarray:
    """Array of all member values of the given enum class (cached)."""
    return np.array([item.value for item in enum_cls])


@functools.cache
def _enum_index(enum_item) -> int:
    """Integer index of the given enum member within its class (cached)."""
    return list(enum_item.__class__).index(enum_item)


class IndexedEnum(enum.Enum):
    """Enum where each member has a corresponding stable integer index.

    API-parity with the reference ``IndexedEnum``
    (multigrid/utils/enum.py:42-89): ``to_index``, ``from_index`` (vectorized
    over arrays), ``add_item``, and ``int()`` conversion.
    """

    def __int__(self) -> int:
        return self.to_index()

    @classmethod
    def add_item(cls, name: str, value: Any):
        """Add a new item to the enumeration (invalidates index caches)."""
        extend_enum(cls, name, value)
        _enum_array.cache_clear()
        _enum_index.cache_clear()

    @classmethod
    def from_index(cls, index):
        """Return the enum member (or array of member values) at ``index``."""
        out = _enum_array(cls)[index]
        return cls(out) if np.ndim(out) == 0 else out

    def to_index(self) -> int:
        """Return the integer index of this enum member."""
        return _enum_index(self)
