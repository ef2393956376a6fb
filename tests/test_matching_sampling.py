import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.optimize

from vsrd_tpu.ops import matching, sampling


class TestHungarian:
    @pytest.mark.parametrize("n", [1, 2, 3, 8, 16, 24])
    def test_matches_scipy_total_cost(self, n):
        rng = np.random.default_rng(n)
        solve = jax.jit(matching.linear_sum_assignment)
        for _ in range(25):
            cost = rng.normal(size=(n, n)).astype(np.float32)
            row_to_col = np.asarray(solve(jnp.asarray(cost)))
            assert sorted(row_to_col) == list(range(n))  # a permutation
            ours = cost[np.arange(n), row_to_col].sum()
            ri, ci = scipy.optimize.linear_sum_assignment(cost)
            np.testing.assert_allclose(ours, cost[ri, ci].sum(), atol=1e-4)

    def test_masked_assignment_respects_validity(self):
        rng = np.random.default_rng(0)
        n, n_valid = 8, 5
        cost = rng.normal(size=(n, n)).astype(np.float32)
        valid = np.zeros(n, bool)
        valid[:n_valid] = True
        row_to_col = np.asarray(
            matching.masked_linear_sum_assignment(
                jnp.asarray(cost), jnp.asarray(valid), jnp.asarray(valid)
            )
        )
        # valid rows match valid cols, optimally within the valid block
        assert set(row_to_col[:n_valid]) == set(range(n_valid)) or all(
            c < n_valid for c in row_to_col[:n_valid]
        )
        sub = cost[:n_valid, :n_valid]
        ri, ci = scipy.optimize.linear_sum_assignment(sub)
        ours = sub[np.arange(n_valid), row_to_col[:n_valid]].sum()
        np.testing.assert_allclose(ours, sub[ri, ci].sum(), atol=1e-4)

    def test_identity_on_diagonal_dominant(self):
        cost = np.full((6, 6), 10.0, np.float32)
        np.fill_diagonal(cost, 0.0)
        row_to_col = np.asarray(matching.linear_sum_assignment(jnp.asarray(cost)))
        np.testing.assert_array_equal(row_to_col, np.arange(6))


class TestMultinomialNoReplacement:
    def test_distinct_indices(self):
        key = jax.random.PRNGKey(0)
        weights = jnp.ones(1000)
        idx = sampling.multinomial_no_replacement(key, weights, 100)
        assert len(np.unique(np.asarray(idx))) == 100

    def test_zero_weight_never_sampled(self):
        key = jax.random.PRNGKey(1)
        weights = jnp.concatenate([jnp.zeros(500), jnp.ones(500)])
        idx = np.asarray(sampling.multinomial_no_replacement(key, weights, 400))
        assert (idx >= 500).all()

    def test_bucketed_matches_flat_exactly(self):
        # sorted_logits enables the bucketed two-phase top-k; both paths
        # add the SAME Gumbel noise (same key + shape), so absent a
        # >k'-winners-per-bucket overflow (prob ~1e-15) the selected
        # indices must be identical, in identical order.
        rng = np.random.default_rng(3)
        size = 1 << 18
        logits = jnp.asarray(np.sort(rng.normal(size=size).astype(np.float32))[::-1].copy())
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            flat = sampling.multinomial_logits(key, logits, 1000)
            fast = sampling.multinomial_logits(
                key, logits, 1000, sorted_logits=True
            )
            np.testing.assert_array_equal(np.asarray(flat), np.asarray(fast))

    def test_bucketed_peaked_distribution(self):
        # all the mass on the first 2000 ranks: the strided bucketing
        # must still select only from them, exactly like the flat path
        size = 1 << 18
        logits = np.full(size, -np.inf, np.float32)
        logits[:2000] = np.linspace(5.0, 0.0, 2000, dtype=np.float32)
        logits = jnp.asarray(logits)
        key = jax.random.PRNGKey(7)
        flat = sampling.multinomial_logits(key, logits, 1000)
        fast = sampling.multinomial_logits(key, logits, 1000, sorted_logits=True)
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(fast))
        assert (np.asarray(fast) < 2000).all()

    def test_marginal_frequencies(self):
        # heavier items should be sampled proportionally more often
        keys = jax.random.split(jax.random.PRNGKey(2), 512)
        weights = jnp.asarray([1.0, 2.0, 4.0, 8.0] * 64)  # 256 items
        sample = jax.vmap(
            lambda k: sampling.multinomial_no_replacement(k, weights, 8)
        )(keys)
        counts = np.bincount(np.asarray(sample).ravel(), minlength=256)
        grouped = counts.reshape(64, 4).sum(0).astype(float)
        ratios = grouped / grouped[0]
        # expected close to 1:2:4:8, tolerate sampling noise
        assert ratios[1] == pytest.approx(2.0, rel=0.2)
        assert ratios[2] == pytest.approx(4.0, rel=0.2)
        assert ratios[3] == pytest.approx(8.0, rel=0.2)


class TestSubsetDP:
    @pytest.mark.parametrize("n", [1, 2, 5, 8, 12])
    def test_matches_scipy(self, n):
        rng = np.random.default_rng(100 + n)
        solve = jax.jit(matching.linear_sum_assignment_dp)
        for _ in range(15):
            cost = rng.normal(size=(n, n)).astype(np.float32)
            row_to_col = np.asarray(solve(jnp.asarray(cost)))
            assert sorted(row_to_col) == list(range(n))
            ours = cost[np.arange(n), row_to_col].sum()
            ri, ci = scipy.optimize.linear_sum_assignment(cost)
            np.testing.assert_allclose(ours, cost[ri, ci].sum(), atol=1e-4)

    def test_agrees_with_jv(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            cost = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
            a = matching.linear_sum_assignment_dp(cost)
            b = matching.linear_sum_assignment(cost)
            ca = float(jnp.sum(cost[jnp.arange(8), a]))
            cb = float(jnp.sum(cost[jnp.arange(8), b]))
            assert abs(ca - cb) < 1e-4
