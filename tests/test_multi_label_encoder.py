import numpy as np
import pytest

from segma_tpu.utils.encoders import MultiLabelEncoder

LABELS = ["KCHI", "OCH", "MAL", "FEM"]


@pytest.fixture
def enc():
    return MultiLabelEncoder(LABELS)


def test_transform_inverse(enc):
    for i, label in enumerate(LABELS):
        assert enc.transform(label) == i
        assert enc.inv_transform(i) == label


def test_inv_transform_out_of_range(enc):
    with pytest.raises(ValueError):
        enc.inv_transform(4)
    with pytest.raises(ValueError):
        enc.inv_transform(-1)


def test_one_hot_single(enc):
    np.testing.assert_array_equal(enc.one_hot("OCH"), [0, 1, 0, 0])


def test_one_hot_multi(enc):
    np.testing.assert_array_equal(enc.one_hot({"KCHI", "FEM"}), [1, 0, 0, 1])


def test_one_hot_order_invariance(enc):
    np.testing.assert_array_equal(
        enc.one_hot(["FEM", "MAL"]), enc.one_hot(["MAL", "FEM"])
    )


def test_one_hot_empty(enc):
    np.testing.assert_array_equal(enc.one_hot(()), [0, 0, 0, 0])


def test_contains(enc):
    assert "KCHI" in enc
    assert "nope" not in enc
    with pytest.raises(ValueError):
        ("KCHI", "FEM") in enc


def test_len_and_labels(enc):
    assert len(enc) == 4
    assert enc.labels == tuple(LABELS)
    assert enc.base_labels == tuple(LABELS)


def test_i_to_one_hot(enc):
    np.testing.assert_array_equal(enc.i_to_one_hot(2), [0, 0, 1, 0])
