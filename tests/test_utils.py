import numpy as np

from segma_tpu.utils import set_seed


def test_set_seed_smoke():
    set_seed(123)
    a = np.random.rand(3)
    set_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
