"""Runtime helpers: PRNG key impl selection and Pallas seed-word folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigridmc_tpu.ops.kernels.sor_pallas import MAX_SEED_WORDS, fold_seed_words, seed_words
from multigridmc_tpu.utils.runtime import sampling_key


def test_sampling_key_default_cpu_is_threefry():
    k = sampling_key(7)
    assert "threefry" in str(jax.random.key_impl(k))


def test_sampling_key_explicit_rbg():
    k = sampling_key(7, impl="rbg")
    assert "rbg" in str(jax.random.key_impl(k))
    # rbg keys drive the full sampling API (fold_in/split/normal)
    xi = jax.random.normal(jax.random.fold_in(k, 3), (64,))
    assert bool(jnp.isfinite(xi).all())


def test_fold_seed_words_cap():
    # Mosaic's prng_set_seed_32 accepts at most 2 words; wider key data
    # (e.g. the rbg impl's 4 words) must fold, narrower must pass through.
    w2 = jnp.asarray([[1, 2]], dtype=jnp.int32)
    assert fold_seed_words(w2).shape == (1, 2)
    w4 = jnp.asarray([[1, 2, 4, 8]], dtype=jnp.int32)
    out = fold_seed_words(w4)
    assert out.shape == (1, MAX_SEED_WORDS)
    # the fold must NOT be plain XOR: rbg key data duplicates its two words
    # ([a, b, a, b]), which XOR would collapse to [0, 0] for every key
    dup = jnp.asarray([[3, 9, 3, 9]], dtype=jnp.int32)
    folded = np.asarray(fold_seed_words(dup))
    assert not np.array_equal(folded, [[0, 0]])
    dup2 = jnp.asarray([[4, 9, 4, 9]], dtype=jnp.int32)
    assert not np.array_equal(folded, np.asarray(fold_seed_words(dup2)))


@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_seed_words_from_typed_key(impl):
    k = jax.random.key(5, impl=impl)
    w = seed_words(k)
    assert w.ndim == 1 and w.shape[0] <= MAX_SEED_WORDS
    assert w.dtype == jnp.int32
    # distinct keys give distinct folded seeds
    w2 = seed_words(jax.random.fold_in(k, 1))
    assert not np.array_equal(np.asarray(w), np.asarray(w2))
