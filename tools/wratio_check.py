#!/usr/bin/env python3
"""WRatio differential: recompute every score from a WRatioDump jsonl with
an INDEPENDENT pure-Python implementation of the published rapidfuzz
WRatio spec and diff against the Scala engine's scores.

rapidfuzz itself is not installable here (zero egress), so this is two
independent implementations of the same public algorithm:
  - fuzz.ratio        = normalized indel similarity = 2*LCS/(m+n) * 100
  - fuzz.partial_ratio= best ratio of the shorter string against any
                        same-length window of the longer (optimal alignment)
  - token_sort / token_set composites per the public fuzzywuzzy algorithm
  - WRatio constants 0.95 (unbase), 0.9/0.6 (partial), 1.5/8 (length-ratio
    branch points, rapidfuzz's `len_ratio < 8` variant)
  - default_process: lowercase, non-alphanumeric -> space, trim

Asserts: decision-band equality (>=90 auto / >=70 suggest / >=40 floor)
for every pair, and reports the max absolute score delta (expected 0.0 —
both sides are deterministic implementations of the same spec).

Usage: sbt "Test/runMain graft.WRatioDump /tmp/wr.jsonl"
       python3 tools/wratio_check.py /tmp/wr.jsonl
"""
import json, sys


def process(s):
    out = []
    for c in s:
        # rapidfuzz default_process keeps alphanumerics (unicode letters +
        # digits); Python isalnum() also admits Nl/No numerics (e.g. '²'),
        # which Java's isLetterOrDigit does not — kept here deliberately so
        # the differential FLAGS any corpus where that class matters.
        out.append(c.lower() if c.isalnum() else " ")
    return " ".join("".join(out).split())


def lcs(a, b):
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(prev[j] + 1 if ca == cb else max(prev[j + 1], cur[-1]))
        prev = cur
    return prev[-1]


def ratio(a, b):
    n = len(a) + len(b)
    return 100.0 if n == 0 else 100.0 * 2.0 * lcs(a, b) / n


def partial_ratio(a, b):
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    if not s:
        return 100.0 if not l else 0.0
    if len(s) == len(l):
        return ratio(s, l)
    best = 0.0
    for i in range(len(l) - len(s) + 1):
        r = ratio(s, l[i:i + len(s)])
        if r > best:
            best = r
            if best >= 100.0:
                break
    return best


def tok(s):
    return sorted(t for t in s.split(" ") if t)


def token_sort_ratio(a, b):
    return ratio(" ".join(tok(a)), " ".join(tok(b)))


def partial_token_sort_ratio(a, b):
    return partial_ratio(" ".join(tok(a)), " ".join(tok(b)))


def _set_parts(a, b):
    ta, tb = set(tok(a)), set(tok(b))
    inter = " ".join(sorted(ta & tb))
    da = " ".join(sorted(ta - tb))
    db = " ".join(sorted(tb - ta))
    comb_a = (inter + " " + da).strip() if inter and da else (inter or da)
    comb_b = (inter + " " + db).strip() if inter and db else (inter or db)
    return inter, comb_a, comb_b


def token_set_ratio(a, b):
    inter, ca, cb = _set_parts(a, b)
    return max(ratio(inter, ca), ratio(inter, cb), ratio(ca, cb))


def partial_token_set_ratio(a, b):
    inter, ca, cb = _set_parts(a, b)
    if inter:
        return 100.0
    return partial_ratio(ca, cb)


def wratio(raw_a, raw_b):
    a, b = process(raw_a), process(raw_b)
    if not a or not b:
        return 0.0
    unbase_scale = 0.95
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    end = ratio(a, b)
    if len_ratio < 1.5:
        t = max(token_sort_ratio(a, b), token_set_ratio(a, b))
        return max(end, t * unbase_scale)
    partial_scale = 0.9 if len_ratio < 8.0 else 0.6
    end = max(end, partial_ratio(a, b) * partial_scale)
    pt = max(partial_token_sort_ratio(a, b), partial_token_set_ratio(a, b))
    return max(end, pt * unbase_scale * partial_scale)


def band(s):
    return (s >= 90.0, s >= 70.0, s >= 40.0)


checked = band_mismatch = 0
max_delta = 0.0
examples = []
for line in open(sys.argv[1]):
    rec = json.loads(line)
    py = wratio(rec["a"], rec["b"])
    sc = rec["score"]
    checked += 1
    d = abs(py - sc)
    if d > max_delta:
        max_delta = d
    if band(py) != band(sc):
        band_mismatch += 1
        if len(examples) < 8:
            examples.append((rec["a"], rec["b"], sc, py))

print(f"checked={checked} band_mismatches={band_mismatch} max_score_delta={max_delta:.9f}")
for a, b, sc, py in examples:
    print(f"  BAND a={a!r} b={b!r} engine={sc} python={py}")
sys.exit(1 if band_mismatch else 0)
