"""Serializable numpy-array wrappers for the interpolator models.

Wire format is pinned to the reference (`src/interpn/serialization.py:18-77`)
so JSON round-trips are byte-identical across the two libraries:

* ``data`` is serialized as a JSON *string* containing the list of values
  (float64 text representation for both dtypes — f32 is stored as float64 on
  disk, `serialization.py:46-52`).
* The ``dtype`` literal field discriminates the union.

Arrays are held as host numpy (contiguous) so pydantic stays framework-free;
device placement is handled lazily by the model classes.
"""

from __future__ import annotations

import json
from typing import Annotated, Any, Literal

import numpy as np
from numpy.typing import NDArray
from pydantic import BaseModel, ConfigDict, Field, field_serializer, field_validator


def _coerce(data: Any, np_dtype) -> np.ndarray:
    """Accept a JSON string, ndarray, list, or any array-like (incl. JAX
    arrays) and return a contiguous numpy array of the requested dtype."""
    if isinstance(data, str):
        return np.ascontiguousarray(np.array(json.loads(data), dtype=np_dtype))
    if isinstance(data, np.ndarray):
        return np.ascontiguousarray(data.astype(np_dtype))
    if isinstance(data, list):
        return np.array(data, dtype=np_dtype)
    if hasattr(data, "__array__"):  # device arrays and other array-likes
        return np.ascontiguousarray(np.asarray(data).astype(np_dtype))
    raise TypeError


class ArrayF64(BaseModel):
    """Serializable wrapper for NDArray[float64]."""

    data: NDArray[np.float64]
    dtype: Literal["float64"] = "float64"

    model_config = ConfigDict(frozen=True, extra="forbid", arbitrary_types_allowed=True)

    @field_validator("data", mode="before")
    def _validate_data(data: Any) -> NDArray[np.float64]:
        return _coerce(data, np.float64)

    @field_serializer("data", return_type=str)
    def _serialize_data(data: Any) -> str:
        return json.dumps(data.tolist())


class ArrayF32(BaseModel):
    """Serializable wrapper for NDArray[float32]; stored as float64 text on
    disk, exactly like the reference."""

    data: NDArray[np.float32]
    dtype: Literal["float32"] = "float32"

    model_config = ConfigDict(frozen=True, extra="forbid", arbitrary_types_allowed=True)

    @field_validator("data", mode="before")
    def _validate_data(data: Any) -> NDArray[np.float32]:
        return _coerce(data, np.float32)

    @field_serializer("data", return_type=str)
    def _serialize_data(data: Any) -> str:
        return json.dumps(data.tolist())


Array = Annotated[ArrayF32 | ArrayF64, Field(discriminator="dtype")]
