"""Segmentation post-processing: kNN label smoothing + connected-component
cleanup (reference pixie/voxel/segmentation.py:190-229, 482-630)."""

import numpy as np

from pixie_tpu.voxel.segmentation import (
    connected_component_cleanup,
    local_post_process_segmentation,
)


class TestLocalPostProcess:
    def test_flips_isolated_outliers(self):
        # two well-separated clusters; a few points mislabeled inside each
        rng = np.random.default_rng(0)
        a = rng.normal(0.0, 0.02, (300, 3))
        b = rng.normal(1.0, 0.02, (300, 3))
        coords = np.concatenate([a, b]).astype(np.float32)
        labels = np.concatenate([np.zeros(300, np.int64), np.ones(300, np.int64)])
        noisy = labels.copy()
        noisy[[3, 50, 299, 310, 580]] = 1 - noisy[[3, 50, 299, 310, 580]]
        smoothed = local_post_process_segmentation(coords, noisy, k=50)
        np.testing.assert_array_equal(smoothed, labels)

    def test_matches_bruteforce_vote(self):
        rng = np.random.default_rng(1)
        coords = rng.uniform(0, 1, (120, 3)).astype(np.float32)
        labels = rng.integers(0, 4, 120)
        k = 15
        got = local_post_process_segmentation(coords, labels, k=k, chunk=32)
        d = ((coords[:, None] - coords[None]) ** 2).sum(-1)
        expect = np.empty_like(labels)
        for i in range(len(coords)):
            kth = np.sort(d[i])[k - 1]
            neigh = labels[d[i] <= kth]
            vals, counts = np.unique(neigh, return_counts=True)
            expect[i] = vals[np.argmax(counts)]  # smallest label on ties
        np.testing.assert_array_equal(got, expect)

    def test_k_clamped_to_n(self):
        coords = np.random.default_rng(2).uniform(0, 1, (5, 3)).astype(np.float32)
        labels = np.array([0, 0, 0, 1, 1])
        out = local_post_process_segmentation(coords, labels, k=200)
        # global vote: label 0 wins everywhere
        np.testing.assert_array_equal(out, np.zeros(5, labels.dtype))


class TestConnectedComponentCleanup:
    def test_small_island_relabeled_to_debug(self):
        # main blob of label 0 + a far island of label 0 + a blob of label 1
        main = np.stack([np.linspace(0, 0.2, 30)] * 3, axis=1)
        island = np.stack([np.linspace(2.0, 2.02, 4)] * 3, axis=1)
        other = np.stack([np.linspace(1.0, 1.1, 20)] * 3, axis=1)
        coords = np.concatenate([main, island, other]).astype(np.float32)
        labels = np.array([0] * 30 + [0] * 4 + [1] * 20)
        out = connected_component_cleanup(coords, labels, radius=0.05)
        np.testing.assert_array_equal(out[:30], 0)
        np.testing.assert_array_equal(out[30:34], -1)  # island -> debug label
        np.testing.assert_array_equal(out[34:], 1)

    def test_single_component_untouched(self):
        coords = np.stack([np.linspace(0, 0.3, 40)] * 3, axis=1).astype(np.float32)
        labels = np.zeros(40, np.int64)
        out = connected_component_cleanup(coords, labels, radius=0.05)
        np.testing.assert_array_equal(out, labels)

    def test_components_split_by_label_boundary(self):
        # spatially connected line, but two labels -> each label is one
        # component, nothing relabeled
        coords = np.stack([np.linspace(0, 0.39, 40)] * 3, axis=1).astype(np.float32)
        labels = np.array([0] * 20 + [1] * 20)
        out = connected_component_cleanup(coords, labels, radius=0.05)
        np.testing.assert_array_equal(out, labels)

    def test_empty(self):
        out = connected_component_cleanup(np.zeros((0, 3), np.float32),
                                          np.zeros(0, np.int64))
        assert len(out) == 0
