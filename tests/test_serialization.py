"""JSON wire-format parity with the reference
(`src/interpn/serialization.py:18-77`): data as a JSON string of a list,
discriminated union on dtype, byte-identical round-trips."""

import json

import numpy as np
import pytest

import interpn_tpu as it
from interpn_tpu.models import ArrayF32, ArrayF64


def test_arrayf64_schema():
    a = ArrayF64(data=np.array([1.0, 2.5]))
    d = json.loads(a.model_dump_json())
    assert d == {"data": "[1.0, 2.5]", "dtype": "float64"}


def test_arrayf32_stored_as_float64_text():
    a = ArrayF32(data=np.array([1.0, 2.5], dtype=np.float32))
    d = json.loads(a.model_dump_json())
    assert d["dtype"] == "float32"
    assert json.loads(d["data"]) == [1.0, 2.5]
    rt = ArrayF32.model_validate_json(a.model_dump_json())
    assert rt.data.dtype == np.float32


def test_array_accepts_str_ndarray_list():
    for payload in ("[1.0, 2.0]", np.array([1.0, 2.0]), [1.0, 2.0]):
        a = ArrayF64(data=payload)
        assert np.array_equal(a.data, [1.0, 2.0])
    with pytest.raises(Exception):
        ArrayF64(data=object())


def test_reference_format_string_validates_and_roundtrips():
    """A JSON document in the reference's exact serialization format must
    deserialize, evaluate, and re-serialize byte-identically."""
    s = (
        '{"dims":[5],"starts":{"data":"[0.0]","dtype":"float64"},'
        '"steps":{"data":"[1.0]","dtype":"float64"},'
        '"vals":{"data":"[1.0, 2.0, 3.0, 4.0, 5.0]","dtype":"float64"}}'
    )
    m = it.MultilinearRegular.model_validate_json(s)
    assert m.model_dump_json() == s
    np.testing.assert_allclose(m.eval([np.array([2.5])]), [3.5])


def test_cubic_field_order_includes_linearize_flag():
    m = it.MulticubicRegular.new(
        [4], np.array([0.0]), np.array([1.0]), np.arange(4.0), True
    )
    keys = list(json.loads(m.model_dump_json()).keys())
    assert keys == ["dims", "starts", "steps", "vals", "linearize_extrapolation"]


def test_rectilinear_field_order():
    m = it.MultilinearRectilinear.new(
        [np.array([0.0, 1.0, 3.0])], np.arange(3.0)
    )
    keys = list(json.loads(m.model_dump_json()).keys())
    assert keys == ["grids", "vals"]


def test_frozen_and_extra_forbid():
    m = it.MultilinearRegular.new([2], np.array([0.0]), np.array([1.0]), np.arange(2.0))
    with pytest.raises(Exception):
        m.dims = [3]
    with pytest.raises(Exception):
        it.MultilinearRegular(
            dims=[2],
            starts=ArrayF64(data=[0.0]),
            steps=ArrayF64(data=[1.0]),
            vals=ArrayF64(data=[0.0, 1.0]),
            extra_field=1,
        )


def test_reference_format_all_six_classes():
    """Hand-written reference-schema JSON for every class must deserialize,
    evaluate, and re-serialize byte-identically."""
    cases = [
        (
            it.MultilinearRegular,
            '{"dims":[4],"starts":{"data":"[0.0]","dtype":"float64"},'
            '"steps":{"data":"[1.0]","dtype":"float64"},'
            '"vals":{"data":"[0.0, 1.0, 2.0, 3.0]","dtype":"float64"}}',
        ),
        (
            it.MultilinearRectilinear,
            '{"grids":[{"data":"[0.0, 1.0, 2.5, 4.0]","dtype":"float64"}],'
            '"vals":{"data":"[0.0, 1.0, 2.5, 4.0]","dtype":"float64"}}',
        ),
        (
            it.MulticubicRegular,
            '{"dims":[4],"starts":{"data":"[0.0]","dtype":"float64"},'
            '"steps":{"data":"[1.0]","dtype":"float64"},'
            '"vals":{"data":"[0.0, 1.0, 2.0, 3.0]","dtype":"float64"},'
            '"linearize_extrapolation":true}',
        ),
        (
            it.MulticubicRectilinear,
            '{"grids":[{"data":"[0.0, 1.0, 2.5, 4.0]","dtype":"float64"}],'
            '"vals":{"data":"[0.0, 1.0, 2.5, 4.0]","dtype":"float64"},'
            '"linearize_extrapolation":false}',
        ),
        (
            it.NearestRegular,
            '{"dims":[4],"starts":{"data":"[0.0]","dtype":"float64"},'
            '"steps":{"data":"[1.0]","dtype":"float64"},'
            '"vals":{"data":"[0.0, 1.0, 2.0, 3.0]","dtype":"float64"}}',
        ),
        (
            it.NearestRectilinear,
            '{"grids":[{"data":"[0.0, 1.0, 2.5, 4.0]","dtype":"float64"}],'
            '"vals":{"data":"[0.0, 1.0, 2.5, 4.0]","dtype":"float64"}}',
        ),
    ]
    for cls, s in cases:
        m = cls.model_validate_json(s)
        assert m.model_dump_json() == s, cls.__name__
        out = m.eval([np.array([1.0])])
        assert np.isfinite(out).all(), cls.__name__
