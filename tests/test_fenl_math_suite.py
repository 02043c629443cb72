"""Complete port of the reference's math e2e suite.

Transcribes EVERY test in
/root/reference/crates/sparrow-main/tests/e2e/math_tests.rs (36 tests:
add/sub/mul/div x {i64,f64} x {column,literal}, neg, ceil/round/floor,
zip_min/zip_max, powf, exp, clamp, sqrt) as golden asserts over the
fixtures.rs {i64,f64}_data_fixture Numbers table. Literal float
expectations are copied verbatim from the reference CSV snapshots —
they reproduce bit-exactly as IEEE doubles (verified: e.g.
24.3 - 3.9 == 20.400000000000002). Transcendentals (powf/exp/sqrt) use
rel=1e-13 because java.lang.Math and Rust libm are each allowed sub-ulp
differences.
"""

from __future__ import annotations

import pytest

from kaskada_spark.fenl import fenl

from test_fenl_e2e_suites import _got, _numbers_tl

N = None

# (name, floats, query, {col: expected-6-list}, approx_cols)
CASES = [
    # --- add -----------------------------------------------------------
    ("i64_add", False, "{ add: Numbers.m + Numbers.n }",
     {"add": [15, 27, 23, N, N, N]}, ()),
    ("f64_add", True, "{ add: Numbers.m + Numbers.n }",
     {"add": [15.2, 28.2, 23.8, N, N, N]}, ()),
    ("i64_add_literal", False, "{ add: Numbers.m + 1 }",
     {"add": [6, 25, 18, N, 13, N]}, ()),
    ("f64_add_literal", True, "{ add: Numbers.m + 1 }",
     {"add": [6.2, 25.3, 18.6, N, 13.4, N]}, ()),
    # --- sub -----------------------------------------------------------
    ("i64_sub", False, "{ sub: Numbers.m - Numbers.n }",
     {"sub": [-5, 21, 11, N, N, N]}, ()),
    ("f64_sub", True, "{ sub: Numbers.m - Numbers.n }",
     {"sub": [-4.8, 20.400000000000002, 11.400000000000002, N, N, N]}, ()),
    ("i64_sub_literal", False, "{ sub: Numbers.m - 1 }",
     {"sub": [4, 23, 16, N, 11, N]}, ()),
    ("f64_sub_literal", True, "{ sub: Numbers.m - 1 }",
     {"sub": [4.2, 23.3, 16.6, N, 11.4, N]}, ()),
    # --- mul -----------------------------------------------------------
    ("i64_mul", False, "{ mul: Numbers.m * Numbers.n }",
     {"mul": [50, 72, 102, N, N, N]}, ()),
    ("f64_mul", True, "{ mul: Numbers.m * Numbers.n }",
     {"mul": [52.0, 94.77, 109.12000000000002, N, N, N]}, ()),
    ("i64_mul_literal", False, "{ mul: Numbers.m * 2 }",
     {"mul": [10, 48, 34, N, 24, N]}, ()),
    ("f64_mul_literal", True, "{ mul: Numbers.m * 2 }",
     {"mul": [10.4, 48.6, 35.2, N, 24.8, N]}, ()),
    # --- div (i64 is integer division) ----------------------------------
    ("i64_div", False, "{ div: Numbers.m / Numbers.n }",
     {"div": [0, 8, 2, N, N, N]}, ()),
    ("f64_div", True, "{ div: Numbers.m / Numbers.n }",
     {"div": [0.52, 6.230769230769231, 2.838709677419355, N, N, N]}, ()),
    ("i64_div_literal", False, "{ div: Numbers.m / 2 }",
     {"div": [2, 12, 8, N, 6, N]}, ()),
    ("f64_div_literal", True, "{ div: Numbers.m / 2 }",
     {"div": [2.6, 12.15, 8.8, N, 6.2, N]}, ()),
    # --- neg (operator and named form) -----------------------------------
    ("i64_neg", False, "{ neg_m: -Numbers.m, neg_n: neg(Numbers.n) }",
     {"neg_m": [-5, -24, -17, N, -12, N],
      "neg_n": [-10, -3, -6, -9, N, N]}, ()),
    ("f64_neg", True, "{ neg_m: -Numbers.m, neg_n: neg(Numbers.n) }",
     {"neg_m": [-5.2, -24.3, -17.6, N, -12.4, N],
      "neg_n": [-10.0, -3.9, -6.2, -9.25, N, N]}, ()),
    # --- ceil / round / floor (identity on i64, f64 keeps double type) ---
    ("i64_ceil", False, "{ cm: ceil(Numbers.m), cn: ceil(Numbers.n) }",
     {"cm": [5, 24, 17, N, 12, N], "cn": [10, 3, 6, 9, N, N]}, ()),
    ("f64_ceil", True, "{ cm: ceil(Numbers.m), cn: ceil(Numbers.n) }",
     {"cm": [6.0, 25.0, 18.0, N, 13.0, N],
      "cn": [10.0, 4.0, 7.0, 10.0, N, N]}, ()),
    ("i64_round", False, "{ rm: round(Numbers.m), rn: round(Numbers.n) }",
     {"rm": [5, 24, 17, N, 12, N], "rn": [10, 3, 6, 9, N, N]}, ()),
    ("f64_round", True, "{ rm: round(Numbers.m), rn: round(Numbers.n) }",
     {"rm": [5.0, 24.0, 18.0, N, 12.0, N],
      "rn": [10.0, 4.0, 6.0, 9.0, N, N]}, ()),
    ("i64_floor", False, "{ fm: floor(Numbers.m), fn: floor(Numbers.n) }",
     {"fm": [5, 24, 17, N, 12, N], "fn": [10, 3, 6, 9, N, N]}, ()),
    ("f64_floor", True, "{ fm: floor(Numbers.m), fn: floor(Numbers.n) }",
     {"fm": [5.0, 24.0, 17.0, N, 12.0, N],
      "fn": [10.0, 3.0, 6.0, 9.0, N, N]}, ()),
    # --- zip_min / zip_max (null-strict, literal broadcasts) -------------
    ("i64_zip_min", False,
     "{ z: zip_min(Numbers.m, Numbers.n), z2: zip_min(2, Numbers.n) }",
     {"z": [5, 3, 6, N, N, N], "z2": [2, 2, 2, 2, N, N]}, ()),
    ("f64_zip_min", True,
     "{ z: zip_min(Numbers.m, Numbers.n), z2: zip_min(2, Numbers.n) }",
     {"z": [5.2, 3.9, 6.2, N, N, N], "z2": [2.0, 2.0, 2.0, 2.0, N, N]}, ()),
    ("i64_zip_max", False,
     "{ z: zip_max(Numbers.m, Numbers.n), z2: zip_max(2, Numbers.n) }",
     {"z": [10, 24, 17, N, N, N], "z2": [10, 3, 6, 9, N, N]}, ()),
    ("f64_zip_max", True,
     "{ z: zip_max(Numbers.m, Numbers.n), z2: zip_max(2, Numbers.n) }",
     {"z": [10.0, 24.3, 17.6, N, N, N],
      "z2": [10.0, 3.9, 6.2, 9.25, N, N]}, ()),
    # --- powf (promotes i64 -> f64) --------------------------------------
    ("i64_powf", False,
     """{ p: powf(Numbers.m, Numbers.n), p2m: powf(2, Numbers.m)
        , pn2: powf(Numbers.n, 2) }""",
     {"p": [9765625.0, 13824.0, 24137569.0, N, N, N],
      "p2m": [32.0, 16777216.0, 131072.0, N, 4096.0, N],
      "pn2": [100.0, 9.0, 36.0, 81.0, N, N]},
     ("p", "p2m", "pn2")),
    ("f64_powf", True,
     """{ p: powf(Numbers.m, Numbers.n), p2m: powf(2, Numbers.m)
        , pn2: powf(Numbers.n, 2) }""",
     {"p": [14455510.594905708, 253433.76006548494, 52744665.25889734,
            N, N, N],
      "p2m": [36.75834735990512, 20655175.749880955, 198668.0018056511,
              N, 5404.7044025257765, N],
      "pn2": [100.0, 15.209999999999999, 38.440000000000005, 85.5625,
              N, N]},
     ("p", "p2m", "pn2")),
    # --- exp -------------------------------------------------------------
    ("i64_exp", False, "{ em: exp(Numbers.m), en: exp(Numbers.n) }",
     {"em": [148.4131591025766, 2.648912212984347e10, 24154952.7535753,
             N, 162754.79141900392, N],
      "en": [22026.465794806718, 20.085536923187668, 403.4287934927351,
             8103.083927575384, N, N]},
     ("em", "en")),
    ("f64_exp", True, "{ em: exp(Numbers.m), en: exp(Numbers.n) }",
     {"em": [181.27224187515122, 3.575657481192565e10, 44013193.53483411,
             N, 242801.61749832364, N],
      "en": [22026.465794806718, 49.40244910553017, 492.7490410932563,
             10404.565716560723, N, N]},
     ("em", "en")),
    # --- clamp (null bound = unbounded side; null value = null out) ------
    ("i64_clamp", False,
     """{ c1: clamp(Numbers.m, min = 2, max = Numbers.n)
        , c2: clamp(Numbers.m, min = 2, max = 10)
        , c3: clamp(Numbers.m, min = Numbers.n)
        , c4: clamp(Numbers.m, max = Numbers.n) }""",
     {"c1": [5, 3, 6, N, 12, N], "c2": [5, 10, 10, N, 10, N],
      "c3": [10, 24, 17, N, 12, N], "c4": [5, 3, 6, N, 12, N]}, ()),
    ("f64_clamp", True,
     """{ c1: clamp(Numbers.m, min = 2.3, max = Numbers.n)
        , c2: clamp(Numbers.m, min = 2.1, max = 10.2)
        , c3: clamp(Numbers.m, min = Numbers.n)
        , c4: clamp(Numbers.m, max = Numbers.n) }""",
     {"c1": [5.2, 3.9, 6.2, N, 12.4, N],
      "c2": [5.2, 10.2, 10.2, N, 10.2, N],
      "c3": [10.0, 24.3, 17.6, N, 12.4, N],
      "c4": [5.2, 3.9, 6.2, N, 12.4, N]}, ()),
    # --- sqrt (promotes i64 -> f64; IEEE-exact but Math vs libm safe) ----
    ("f64_sqrt", True, "{ sq: sqrt(Numbers.m) }",
     {"sq": [2.280350850198276, 4.929503017546495, 4.1952353926806065,
             N, 3.521363372331802, N]},
     ("sq",)),
    ("i64_sqrt", False, "{ sq: sqrt(Numbers.m) }",
     {"sq": [2.23606797749979, 4.898979485566356, 4.123105625617661,
             N, 3.4641016151377544, N]},
     ("sq",)),
]


@pytest.mark.parametrize(
    "floats,query,expected,approx_cols",
    [c[1:] for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_math_golden(spark, floats, query, expected, approx_cols):
    out = fenl(query, {"Numbers": _numbers_tl(spark, floats=floats)})
    cols = list(expected)
    got = _got(out, *cols)
    assert len(got) == 6
    for j, c in enumerate(cols):
        actual = [got[i][j] for i in range(6)]
        want = expected[c]
        if c in approx_cols:
            for a, w in zip(actual, want):
                if w is None:
                    assert a is None, f"{c}: expected null, got {a}"
                else:
                    assert a == pytest.approx(w, rel=1e-13), c
        else:
            assert actual == want, c


def test_math_echo_columns_and_keys(spark):
    # the reference snapshots also pin the projected m/n echoes and the
    # A,B,A,A,A,A key pattern — assert them once (identical across tests)
    out = fenl(
        "{ m: Numbers.m, n: Numbers.n, add: Numbers.m + Numbers.n }",
        {"Numbers": _numbers_tl(spark)},
    )
    got = {r["_subsort"]: r for r in out.collect()}
    assert [got[i]["m"] for i in range(6)] == [5, 24, 17, N, 12, N]
    assert [got[i]["n"] for i in range(6)] == [10, 3, 6, 9, N, N]
    assert [got[i]["_key"] for i in range(6)] == list("ABAAAA")
