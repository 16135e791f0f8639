"""scripts/rotate_window.py — the record-age rotation generator.

Synthetic records only: the repo's real CORRECTNESS files gain a new
round every driver run, so pinning against them would fail at every
round boundary by construction. The generator's contract (red first,
changed second, oldest-green-first with alphabetical tiebreak,
never-checked names oldest of all) is what's pinned here.
"""

from __future__ import annotations

import importlib.util
import os


def _mod():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(root, "scripts", "rotate_window.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_latest_green_and_red_detection():
    m = _mod()
    recs = {
        "a": [(1, True), (3, True)],          # green, age r3
        "b": [(1, True), (4, False)],         # latest row red
        "c": [(2, False), (2, True)],         # red then green same round
        "d": [(1, False)],                    # never green
    }
    ages = m.latest_green(recs)
    assert ages == {"a": 3, "b": 1, "c": 2}
    assert m.currently_red(recs) == {"b", "d"}


def test_recommend_orders_red_changed_then_oldest():
    m = _mod()
    names = ["w", "x", "y", "z", "q", "never"]
    ages = {"w": 3, "x": 1, "y": 1, "z": 2, "q": 5}  # "never": no green row
    red = {"q"}
    out = m.recommend(names, ages, red, changed=["z"], slots=5)
    # red first, changed second, then never-checked (age 0) before r1
    # names (alphabetical within an age), r1 before r2/r3
    assert out == ["q", "z", "never", "x", "y"]
    # changed name already red is not duplicated
    out2 = m.recommend(names, ages, red, changed=["q", "z"], slots=6)
    assert out2 == ["q", "z", "never", "x", "y", "w"]


def test_recommend_is_deterministic_and_caps_slots():
    m = _mod()
    names = [f"n{i:02d}" for i in range(60)]
    ages = {n: 1 + (i % 3) for i, n in enumerate(names)}
    a = m.recommend(names, ages, set(), [], slots=50)
    b = m.recommend(list(reversed(names)), ages, set(), [], slots=50)
    assert a == b and len(a) == 50
