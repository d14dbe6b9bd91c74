"""PowersetEncoder: subset classes, marginalization back to labels."""

import numpy as np
import pytest

from segma_tpu.utils.encoders import PowersetEncoder

LABELS = ["A", "B", "C"]


@pytest.fixture
def enc():
    return PowersetEncoder(LABELS, max_set_size=2)


def test_class_enumeration(enc):
    # empty + 3 singles + 3 pairs = 7
    assert len(enc) == 7
    assert enc.inv_transform(0) == ()
    assert enc.transform(()) == 0
    assert enc.transform("A") == enc.transform(("A",))


def test_order_invariance(enc):
    assert enc.transform(("B", "A")) == enc.transform(("A", "B"))


def test_one_hot(enc):
    v = enc.one_hot({"A", "C"})
    assert v.sum() == 1
    assert enc.inv_transform(int(np.argmax(v))) == ("A", "C")


def test_unknown_label_raises(enc):
    with pytest.raises(KeyError):
        enc.transform("nope")


def test_overflow_set_truncates(enc):
    # 3 simultaneous labels with max_set_size=2 -> first 2 in vocab order
    assert enc.inv_transform(enc.transform(("C", "B", "A"))) == ("A", "B")


def test_to_multilabel_marginals(enc):
    probs = np.zeros((1, len(enc)), np.float32)
    probs[0, enc.transform(("A",))] = 0.5
    probs[0, enc.transform(("A", "B"))] = 0.3
    probs[0, enc.transform(())] = 0.2
    marg = enc.to_multilabel(probs)
    np.testing.assert_allclose(marg[0], [0.8, 0.3, 0.0], atol=1e-7)


def test_contains(enc):
    assert "A" in enc
    assert ("A", "B") in enc
    assert ("A", "B", "C") not in enc
