"""ERD tests: exact parity with sklearn complete-linkage clustering and the
reference's soft-ERD formulas."""
import numpy as np
import jax.numpy as jnp

from mri_super_resolution_tpu.ops.erd import (
    _complete_linkage_split,
    _ward_split,
    auto_erd,
    soft_erd_mean,
    soft_erd_weights,
)


class TestCompleteLinkage:
    def test_matches_sklearn(self, rng):
        from sklearn.cluster import AgglomerativeClustering

        for trial in range(20):
            vals = rng.uniform(size=9).astype(np.float64)
            ours = np.asarray(_complete_linkage_split(jnp.asarray(vals)))
            db = AgglomerativeClustering(n_clusters=2, linkage="complete").fit(
                vals.reshape(-1, 1)
            )
            # labels may be swapped; compare partitions
            same = (ours == db.labels_).all() or (ours == 1 - db.labels_).all()
            assert same, f"trial {trial}: {vals} ours={ours} sklearn={db.labels_}"

    def test_obvious_outlier(self):
        vals = jnp.asarray([1.0, 1.02, 0.99, 1.01, 5.0])
        labels = np.asarray(_complete_linkage_split(vals))
        assert labels[-1] != labels[0]
        assert (labels[:-1] == labels[0]).all()


class TestWardLinkage:
    def test_matches_sklearn(self, rng):
        from sklearn.cluster import AgglomerativeClustering

        for trial in range(20):
            A = int(rng.integers(4, 12))
            vals = rng.uniform(size=A).astype(np.float64)
            ours = np.asarray(_ward_split(jnp.asarray(vals)))
            db = AgglomerativeClustering(n_clusters=2, linkage="ward").fit(
                vals.reshape(-1, 1)
            )
            same = (ours == db.labels_).all() or (ours == 1 - db.labels_).all()
            assert same, f"trial {trial}: {vals} ours={ours} sklearn={db.labels_}"

    def test_upper_cluster_is_label_1(self):
        vals = jnp.asarray([1.0, 1.02, 0.99, 1.01, 5.0, 5.1])
        labels = np.asarray(_ward_split(vals))
        assert (labels == np.asarray([0, 0, 0, 0, 1, 1])).all()


class TestAutoERD:
    def test_mode3_ward_keeps_strict_majority(self, rng):
        # the superres.ipynb cell-10 rule: keep only the larger cluster
        img = np.ones((1, 2, 9), dtype=np.float32)
        img += 0.01 * rng.normal(size=img.shape).astype(np.float32)
        img[0, 0, :4] = 0.2  # 4 low / 5 high -> keep the 5 high
        accept = np.asarray(auto_erd(jnp.asarray(img), mode=3, linkage="ward"))
        assert (accept[0, 0, :4] == 0).all() and (accept[0, 0, 4:] == 1).all()
        # near-uniform pixel: the rule keeps whatever the larger cluster is
        assert accept[0, 1].sum() >= 5

    def test_mode3_tie_keeps_all(self):
        img = np.zeros((1, 1, 8), dtype=np.float32)
        img[0, 0, :4] = 1.0
        img[0, 0, 4:] = 2.0
        accept = np.asarray(auto_erd(jnp.asarray(img), mode=3, linkage="ward"))
        assert accept.sum() == 8


    def test_mode1_rejects_minority(self, rng):
        H, W, A = 4, 4, 9
        img = np.ones((H, W, A), dtype=np.float32) + 0.01 * rng.normal(size=(H, W, A)).astype(np.float32)
        # pixel (1,2): two dropped acquisitions
        img[1, 2, 3] = 0.2
        img[1, 2, 7] = 0.25
        accept = np.asarray(auto_erd(jnp.asarray(img), mode=1))
        assert accept.shape == (H, W, A)
        assert accept[1, 2, 3] == 0 and accept[1, 2, 7] == 0
        assert accept[1, 2].sum() == A - 2
        # clean pixels: mode 1 can only reject a minority when the majority
        # holds >= 2/3 A, so at least ceil(2/3 A) acquisitions survive
        assert accept[0, 0].sum() >= int(np.ceil(2 * A / 3))

    def test_mode1_no_rejection_when_balanced(self, rng):
        # 5 low / 4 high: majority 5 < 2/3*9 = 6, so nothing rejected
        img = np.zeros((1, 1, 9), dtype=np.float32)
        img[0, 0, :5] = 1.0
        img[0, 0, 5:] = 2.0
        accept = np.asarray(auto_erd(jnp.asarray(img), mode=1))
        assert accept.sum() == 9

    def test_mode2_rejects_lower_cluster_only_where_erd_positive(self, rng):
        """master.py:88-93: where erd_map > 0, the reference zeroes the
        LOWER-mean cluster (motion dropout darkens outliers)."""
        H, W, A = 2, 2, 6
        img = np.ones((H, W, A), dtype=np.float32)
        img[..., :2] = 3.0  # bright cluster
        img += 0.01 * rng.normal(size=img.shape).astype(np.float32)
        erd_map = np.zeros((H, W), dtype=np.float32)
        erd_map[0, 0] = 1.0
        accept = np.asarray(auto_erd(jnp.asarray(img), jnp.asarray(erd_map), mode=2))
        assert (accept[0, 0, :2] == 1).all()  # higher-mean cluster kept
        assert (accept[0, 0, 2:] == 0).all()  # lower-mean cluster rejected
        assert accept[0, 1].sum() == A  # untouched where erd == 0


    def test_mode2_matches_reference_loop(self, rng):
        """Statement-level transcription of master.py:85-93 (sklearn
        clustering + the sample_means comparison) vs the vectorised op."""
        from sklearn.cluster import AgglomerativeClustering

        H, W, A = 5, 5, 9
        img = rng.uniform(0.2, 1.0, size=(H, W, A)).astype(np.float32)
        erd_map = (rng.uniform(size=(H, W)) > 0.5).astype(np.float32)
        expected = np.ones((H, W, A))
        inx = np.arange(A)
        for i in range(H):
            for j in range(W):
                acq = img[i, j, :].reshape(-1, 1)
                db = AgglomerativeClustering(
                    n_clusters=2, linkage="complete").fit(acq)
                sample_means = [acq[db.labels_ == x].mean()
                                for x in set(db.labels_)]
                if erd_map[i, j] > 0:
                    for k in range(2):
                        if sample_means[k] > sample_means[1 - k]:
                            expected[i, j, inx[db.labels_ == (1 - k)]] = 0
        accept = np.asarray(
            auto_erd(jnp.asarray(img), jnp.asarray(erd_map), mode=2))
        np.testing.assert_array_equal(accept, expected)


class TestSoftERD:
    def _setup(self, rng):
        H, W, A = 6, 6, 8
        acq = rng.uniform(0.5, 1.0, size=(H, W, A)).astype(np.float32)
        b0 = rng.uniform(1.0, 2.0, size=(H, W)).astype(np.float32)
        return acq, b0

    def test_weights_overflow_falls_back_to_onehot(self, rng):
        """Raw-intensity inputs with temp floored at 2 would make exp(x/T)
        inf in f32; the onehot fallback the reference INTENDED (its
        RuntimeWarning handler is dead code — numpy warns, not raises, so
        the reference actually yields inf) must kick in — a documented
        deviation, see soft_erd_weights."""
        H, W, A = 2, 2, 5
        acq = rng.uniform(300.0, 400.0, size=(H, W, A)).astype(np.float32)
        b0 = rng.uniform(800.0, 1000.0, size=(H, W)).astype(np.float32)
        w = np.asarray(soft_erd_weights(
            jnp.asarray(acq), jnp.asarray(b0), jnp.asarray(0.1)))
        assert np.isfinite(w).all()
        for i in range(H):
            for j in range(W):
                expected = np.zeros(A)
                expected[np.argmax(acq[i, j])] = 1.0
                np.testing.assert_array_equal(w[i, j], expected)

    def test_mean_matches_reference_loop(self, rng):
        acq, b0 = self._setup(rng)
        noise_level = 0.01
        ours = np.asarray(
            soft_erd_mean(jnp.asarray(acq), jnp.asarray(b0), jnp.asarray(noise_level))
        )
        H, W, A = acq.shape
        expected = np.zeros((H, W))
        for i in range(H):
            for j in range(W):
                x = acq[i, j]
                if x.mean() > 2 * noise_level:
                    temp = max(1000 * np.exp(-20 * (x.mean() / b0[i, j])), 2)
                    a = np.exp(x / temp) / np.sum(np.exp(x / temp))
                    expected[i, j] = np.sum(a * x)
                else:
                    expected[i, j] = x.mean()
        np.testing.assert_allclose(ours, expected, rtol=1e-4)

    def test_below_noise_uses_plain_mean(self, rng):
        acq, b0 = self._setup(rng)
        huge_noise = 10.0  # everything below 2*noise
        ours = np.asarray(
            soft_erd_mean(jnp.asarray(acq), jnp.asarray(b0), jnp.asarray(huge_noise))
        )
        np.testing.assert_allclose(ours, acq.mean(-1), rtol=1e-5)

    def test_weights_match_reference(self, rng):
        acq, b0 = self._setup(rng)
        noise_level = 0.01
        ours = np.asarray(
            soft_erd_weights(jnp.asarray(acq), jnp.asarray(b0), jnp.asarray(noise_level))
        )
        H, W, A = acq.shape
        for i in range(0, H, 3):
            for j in range(0, W, 3):
                x = acq[i, j]
                if x.mean() > 2 * noise_level:
                    temp = max(1000 * np.exp(-20 * (x.mean() / b0[i, j])), 2)
                    expected = np.exp(x / temp)
                else:
                    expected = np.full(A, 1 / A)
                np.testing.assert_allclose(ours[i, j], expected, rtol=1e-4)

    def test_weights_uniform_below_noise(self, rng):
        acq, b0 = self._setup(rng)
        ours = np.asarray(
            soft_erd_weights(jnp.asarray(acq), jnp.asarray(b0), jnp.asarray(10.0))
        )
        np.testing.assert_allclose(ours, 1.0 / acq.shape[-1], rtol=1e-6)
