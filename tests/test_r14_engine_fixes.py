"""Round-14 engine fixes (slot-free — none touch a registered query's
results):

1. ADVICE r13 #3: ``canonical_plan``'s both-renders-failed return was a
   COLLIDABLE fingerprint (``f"Error: {exc}"`` — two different failing
   plans with identical exception text shared a cache key, the same
   wrong-data-hit class the truncation branch uuid-salts). Now salted
   with an uncacheable uuid marker.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_render_failure_fingerprint_is_unmatchable():
    """Two plans whose rendering fails with IDENTICAL exception text must
    NOT canonicalize equal — a render failure may never produce a shared
    cache key (wrong-data hit). The salted marker also stays loud in the
    text so operators can grep for it."""
    from dbfs_spark_cache_spark.plans.fingerprint import canonical_plan

    class Boom:
        """Object that fails BOTH render paths with stable text."""

        @property
        def _jdf(self):
            raise RuntimeError("stable failure text")

        def explain(self, mode=None):
            raise RuntimeError("stable failure text")

    a = canonical_plan(Boom())
    b = canonical_plan(Boom())
    assert a != b, "identical-text render failures must not share a key"
    for p in (a, b):
        assert "Error:" in p and "uncacheable" in p
