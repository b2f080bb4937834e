"""Keyframe-policy parity tests (LocalMap::insertSignature,
/root/reference/corelib/src/LocalMap.cpp:95-126).

Drives keyframe_update through the three trigger conditions and pins the
decisions at the exact reference thresholds:
  * feature:     newFeatureCount > 0.2 * maxFeature          (:99)
  * translation: sigCount > 10 AND ||Σ|t|||² > MinTranslation (:105-106)
                 — note the squared norm is compared against the threshold
                 directly; the threshold itself is NOT squared.
  * parallax:    parallaxCount >= MinParallax                 (:116-121)
"""

import jax.numpy as jnp
import numpy as np

from visfs_tpu.slam.estimator import keyframe_update
from visfs_tpu.slam.state import KeyframeCounters

MAX_FEATURES = 300
MIN_TRANSLATION = 0.5
MIN_PARALLAX = 60.0


def fresh_counters():
    return KeyframeCounters(
        new_feature_count=jnp.zeros((), jnp.int32),
        signature_count=jnp.zeros((), jnp.int32),
        parallax_count=jnp.zeros((), jnp.float32),
        translation_count=jnp.zeros((3,), jnp.float32),
    )


def step(c, n_new=0, t=(0.0, 0.0, 0.0), ok=True, parallax=0.0):
    tf = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.asarray(t))
    kf, c = keyframe_update(
        c, jnp.asarray(n_new, jnp.int32), tf, jnp.asarray(ok),
        jnp.asarray(parallax, jnp.float32),
        MAX_FEATURES, MIN_TRANSLATION, MIN_PARALLAX,
    )
    return bool(kf), c


def test_feature_condition_threshold():
    # 0.2 * 300 = 60: fires strictly above, not at.
    kf, c = step(fresh_counters(), n_new=60)
    assert not kf
    kf, c = step(c, n_new=1)  # accumulated 61 > 60
    assert kf
    # counters cleared after firing
    assert int(c.new_feature_count) == 0
    assert int(c.signature_count) == 0


def test_feature_condition_accumulates_across_frames():
    c = fresh_counters()
    for _ in range(6):  # 6 * 10 = 60, not > 60
        kf, c = step(c, n_new=10)
        assert not kf
    kf, c = step(c, n_new=1)
    assert kf


def test_translation_condition_requires_11_signatures():
    # Large motion but the signatureCount > 10 gate holds it back to
    # frame 11 (LocalMap.cpp:104).
    c = fresh_counters()
    for i in range(10):
        kf, c = step(c, t=(10.0, 0.0, 0.0))
        assert not kf, f"fired at signature {i + 1}"
    kf, c = step(c, t=(10.0, 0.0, 0.0))
    assert kf


def test_translation_threshold_is_unsquared():
    # Accumulate |t| so that after 11 frames the squared norm of the
    # accumulated translation straddles MinTranslation = 0.5:
    #   11 frames of dx: (11*dx)^2 vs 0.5.
    # Reference fires when (Σ|t|)² > 0.5, i.e. Σ|t| > 0.7071 m — NOT at
    # Σ|t| > 0.5 m and NOT at (Σ|t|)² > 3·0.5².
    c = fresh_counters()
    below = 0.70 / 11.0  # Σ = 0.70, squared 0.49 < 0.5 -> no keyframe
    for _ in range(11):
        kf, c = step(c, t=(below, 0.0, 0.0))
    assert not kf, "0.70 m accumulated must NOT fire ((0.70)^2 < 0.5)"

    c = fresh_counters()
    above = 0.72 / 11.0  # Σ = 0.72, squared 0.5184 > 0.5 -> keyframe
    for _ in range(11):
        kf, c = step(c, t=(above, 0.0, 0.0))
    assert kf, "0.72 m accumulated must fire ((0.72)^2 > 0.5)"
    assert float(jnp.sum(c.translation_count)) == 0.0


def test_translation_accumulates_componentwise_abs():
    # cwiseAbs accumulation (LocalMap.cpp:98): oscillating motion does not
    # cancel.  22 frames of alternating +/-0.04 m -> Σ|t| = 0.88,
    # 0.88² = 0.7744 > 0.5 fires despite net displacement 0.
    c = fresh_counters()
    fired = False
    for i in range(22):
        kf, c = step(c, t=((0.04 if i % 2 == 0 else -0.04), 0.0, 0.0))
        fired = fired or kf
    assert fired


def test_translation_skips_invalid_transform():
    c = fresh_counters()
    for _ in range(11):
        kf, c = step(c, t=(10.0, 0.0, 0.0), ok=False)
    assert not kf


def test_parallax_condition():
    c = fresh_counters()
    kf, c = step(c, parallax=59.99)
    assert not kf
    kf, c = step(c, parallax=0.01)  # accumulated 60.0 >= 60.0 fires (>=)
    assert kf
    assert float(c.parallax_count) == 0.0


def test_parallax_fires_at_exact_threshold():
    kf, _ = step(fresh_counters(), parallax=60.0)
    assert kf


def test_no_condition_no_keyframe():
    c = fresh_counters()
    for _ in range(20):
        kf, c = step(c, n_new=2, t=(0.001, 0, 0), parallax=0.5)
        assert not kf
    # counters kept accumulating
    assert int(c.new_feature_count) == 40
    assert np.isclose(float(c.parallax_count), 10.0, atol=1e-5)
