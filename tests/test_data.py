"""Data layer tests: IDX round-trip (native C++ + numpy fallback), dataset
assembly with the synthetic-image fallback."""

import numpy as np

from lbfgs_ffnn_tpu.data.idx import (
    read_idx_images,
    read_idx_labels_onehot,
    read_idx_labels_u8,
    write_idx_u8,
)
from lbfgs_ffnn_tpu.data.datasets import (
    load_fashion_mnist,
    load_mnist,
    synthetic_images_for_labels,
)
from lbfgs_ffnn_tpu.runtime import get_lib


def test_native_runtime_builds():
    """The native C++ runtime must be available in this environment (g++ is
    baked in); the numpy fallback exists for degraded environments only."""
    assert get_lib() is not None


def test_idx_images_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
    p = tmp_path / "imgs.idx3-ubyte"
    write_idx_u8(p, imgs)
    loaded = read_idx_images(p)
    assert loaded.shape == (7, 20)
    np.testing.assert_allclose(loaded, imgs.reshape(7, 20).astype(np.float32) / 255.0)
    # max_items truncation
    assert read_idx_images(p, max_items=3).shape == (3, 20)


def test_idx_labels_roundtrip(tmp_path):
    labels = np.array([0, 3, 9, 1, 1], dtype=np.uint8)
    p = tmp_path / "labels.idx1-ubyte"
    write_idx_u8(p, labels)
    oh = read_idx_labels_onehot(p, num_classes=10)
    assert oh.shape == (5, 10)
    np.testing.assert_array_equal(np.argmax(oh, axis=1), labels)
    np.testing.assert_array_equal(oh.sum(axis=1), np.ones(5, np.float32))
    np.testing.assert_array_equal(read_idx_labels_u8(p), labels)


def test_real_reference_labels_parse():
    """The reference snapshot ships real MNIST label files — parse them."""
    oh = read_idx_labels_onehot(
        "/root/reference/tests/mnist/train-labels.idx1-ubyte", max_items=1000
    )
    assert oh.shape == (1000, 10)
    # real MNIST label stream starts 5,0,4,1,9,...
    np.testing.assert_array_equal(np.argmax(oh[:5], axis=1), [5, 0, 4, 1, 9])


def test_synthetic_images_deterministic_and_class_structured():
    labels = np.array([0, 0, 1, 1, 2] * 10)
    a = synthetic_images_for_labels(labels, seed=7)
    b = synthetic_images_for_labels(labels, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (50, 784)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # same-class samples are closer than cross-class on average
    d_same = np.linalg.norm(a[0] - a[1])
    d_cross = np.linalg.norm(a[0] - a[2])
    assert d_same < d_cross


def test_load_mnist_small():
    ds = load_mnist(train_size=256, test_size=128)
    assert ds.train_x.shape == (256, 784)
    assert ds.train_y.shape == (256, 10)
    assert ds.test_x.shape == (128, 784)
    assert ds.train_x.dtype == np.float32
    # labels are the real MNIST stream even when images are synthetic
    np.testing.assert_array_equal(np.argmax(ds.train_y[:5], axis=1), [5, 0, 4, 1, 9])


def test_load_fashion_small():
    ds = load_fashion_mnist(train_size=64, test_size=32)
    assert ds.train_x.shape == (64, 784)
    assert ds.test_y.shape == (32, 10)
