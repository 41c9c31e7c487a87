"""Tests for the corpus-quality operators (repetition stats, boilerplate
removal, benchmark decontamination)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _brute_repetition(text, n):
    if text is None:
        return 0.0, 0.0
    ws = text.split(" ")
    grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
    if not grams:
        return 0.0, 0.0
    from collections import Counter

    c = Counter(grams)
    top = max(c.values()) / len(grams)
    dup = sum(v for v in c.values() if v > 1) / len(grams)
    return top, dup


def test_repetition_stats_matches_bruteforce(ray_session):
    from packs_ray.functions.webquality import repetition_stats

    texts = ["a b a b a b", "x y z", "q", "", None, "w w w w",
             "one two  three", "a a b b a a"]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = (repetition_stats(_ds(rows), "doc_id", "text", ns=(2, 3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        exp_words = 0 if t is None else len(t.split(" "))
        assert out.loc[i, "n_words"] == exp_words
        for n in (2, 3):
            top, dup = _brute_repetition(t, n)
            assert out.loc[i, f"top_{n}gram_frac"] == pytest.approx(top)
            assert out.loc[i, f"dup_{n}gram_frac"] == pytest.approx(dup)


def test_repetition_runs_never_cross_documents(ray_session):
    from packs_ray.functions.webquality import repetition_stats

    # identical adjacent docs: grams must not bleed across the boundary
    rows = [{"doc_id": 0, "text": "p q"}, {"doc_id": 1, "text": "q p"}]
    out = (repetition_stats(_ds(rows), "doc_id", "text", ns=(2,))
           .to_pandas().sort_values("doc_id"))
    assert (out["top_2gram_frac"] == 1.0).all()  # one gram each, count 1
    assert (out["dup_2gram_frac"] == 0.0).all()


def test_boilerplate_texts_distinct_groups(ray_session):
    from packs_ray.functions.webquality import boilerplate_texts

    rows = []
    # "ok" in 3 convs (one conv repeats it -> 4 rows, 3 groups)
    for c in ("a", "a", "b", "c"):
        rows.append({"conv_id": c, "text": "ok"})
    # "  OK " normalizes to the same text, conv d -> 4 groups total
    rows.append({"conv_id": "d", "text": "  OK \t"})
    # below threshold
    rows.append({"conv_id": "a", "text": "rare"})
    # empty/null excluded
    rows.append({"conv_id": "e", "text": "   "})
    rows.append({"conv_id": "e", "text": None})
    out = (boilerplate_texts(_ds(rows), "conv_id", "text", min_groups=3)
           .to_pandas())
    assert len(out) == 1
    assert out.iloc[0]["text_norm"] == "ok"
    assert out.iloc[0]["n_groups"] == 4
    assert out.iloc[0]["n_rows"] == 5


def test_drop_boilerplate_keeps_rare_rows(ray_session):
    from packs_ray.functions.webquality import drop_boilerplate

    rows = ([{"conv_id": f"c{i}", "text": "yes"} for i in range(6)]
            + [{"conv_id": "c0", "text": "unique words here"},
               {"conv_id": "c1", "text": None}])
    kept = (drop_boilerplate(_ds(rows), "conv_id", "text", min_groups=5)
            .to_pandas())
    texts = set(kept["text"].dropna())
    assert texts == {"unique words here"}
    assert kept["text"].isna().sum() == 1  # nulls are never boilerplate


def test_decontaminate_counts_positions(ray_session):
    from packs_ray.functions.webquality import decontaminate

    bench = ["secret phrase here now", None]
    rows = [
        {"doc_id": 0, "text": "intro secret phrase here now outro"},  # 2 hits (n=3)
        {"doc_id": 1, "text": "secret phrase somewhere else"},        # 0 hits
        {"doc_id": 2, "text": "phrase here now"},                     # 1 hit
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": "unseen words entirely fresh"},
    ]
    out = (decontaminate(_ds(rows), "doc_id", "text", bench, n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_hits"]) == [2, 0, 1, 0, 0, 0]
    assert list(out["contaminated"]) == [True, False, True, False, False, False]


def test_decontaminate_empty_bench(ray_session):
    from packs_ray.functions.webquality import decontaminate

    rows = [{"doc_id": 0, "text": "a b c d"}]
    out = decontaminate(_ds(rows), "doc_id", "text", [], n=3).to_pandas()
    assert list(out["n_hits"]) == [0]


def test_build_bench_grams_overflow_guard():
    from packs_ray.functions.webquality import build_bench_grams

    with pytest.raises(ValueError, match="too large"):
        # 2^63^(1/2) ~ 3e9 words is unreachable; fake it with n huge
        build_bench_grams(["a b c d e f g h"], n=40)


def test_drop_boilerplate_hash_matches_string_filter(ray_session):
    """The 128-bit-hash broadcast must drop exactly the rows a direct
    string-membership filter would (VERDICT r03 #3 equality check),
    including normalization (strip+lower) and the empty/null carve-outs."""
    import numpy as np

    from packs_ray.functions.webquality import (boilerplate_texts,
                                                drop_boilerplate)

    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        c = f"c{i % 40}"
        if i % 3 == 0:
            rows.append({"conv_id": c, "text": "  Subscribe To Our NEWSLETTER "})
        elif i % 3 == 1:
            rows.append({"conv_id": c, "text": "cookie consent required"})
        else:
            rows.append({"conv_id": c,
                         "text": f"unique line {rng.integers(1 << 30)}"})
    rows.append({"conv_id": "z", "text": None})
    rows.append({"conv_id": "z", "text": "   "})
    ds = _ds(rows)

    bp = set(boilerplate_texts(ds, "conv_id", "text", min_groups=5)
             .to_pandas()["text_norm"])
    assert bp == {"subscribe to our newsletter", "cookie consent required"}
    expected = [r["text"] for r in rows
                if r["text"] is None or r["text"].strip().lower() not in bp]

    kept = drop_boilerplate(ds, "conv_id", "text", min_groups=5).to_pandas()
    assert sorted(kept["text"], key=lambda x: (x is None, x)) == \
        sorted(expected, key=lambda x: (x is None, x))


def test_drop_boilerplate_broadcast_cap_surfaced(ray_session, capsys):
    """Over-cap boilerplate sets degrade to a partial filter with a
    printed notice — never an unbounded broadcast."""
    from packs_ray.functions.webquality import drop_boilerplate

    rows = []
    for v in range(8):  # 8 distinct boilerplate texts, 5 convs each
        for c in range(5):
            rows.append({"conv_id": f"c{c}", "text": f"boiler {v}"})
    kept = drop_boilerplate(_ds(rows), "conv_id", "text", min_groups=5,
                            max_broadcast=3).to_pandas()
    assert "exceeds max_broadcast" in capsys.readouterr().out
    # 3 of the 8 texts filtered -> 25 rows survive out of 40
    assert len(kept) == 25


def test_dedup_lines_first_occurrence_and_rebuild(ray_session):
    """dedup_lines: a repeated line survives only at its minimal
    (doc, idx); docs rebuilt in line order; a doc losing every line
    disappears; empty lines participate; repartition-stable."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.webquality import dedup_lines

    docs = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "t": ["keep-a\nshared\nkeep-b",
              "shared\nonly-2",
              "shared"],          # doc 3 loses its only line
    })
    out = dedup_lines(ray.data.from_arrow(docs), "id", "t").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == [1, 2]
    assert out.loc[0, "t"] == "keep-a\nshared\nkeep-b"
    assert out.loc[1, "t"] == "only-2"

    # empty lines dedup too: the first '' wins, later ones vanish
    docs2 = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "t": ["a\n\nb", "c\n\nd"],
    })
    out2 = dedup_lines(ray.data.from_arrow(docs2), "id", "t").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out2.loc[0, "t"] == "a\n\nb"
    assert out2.loc[1, "t"] == "c\nd"

    out9 = dedup_lines(ray.data.from_arrow(docs).repartition(5),
                       "id", "t").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out9)


def test_gopher_flags_rules(ray_session):
    """gopher_flags: each rule trips on a crafted document; bullet and
    ellipsis line fractions count real lines; nulls count as empty."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.webquality import gopher_flags

    good = ("the quick brown fox jumps over the lazy dog and then it "
            "runs to the old mill where it sleeps in the warm sun all "
            "day long before the moon rises over the quiet hills")
    docs = pa.table({
        "id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "t": [
            good,                                   # passes everything
            "short text only here",                 # too few words
            "# ## " * 30 + good,                    # symbol ratio high
            "- a\n- b\n- c\n- d",                   # all bullet lines
            None,                                   # null -> empty
        ],
    })
    out = gopher_flags(ray.data.from_arrow(docs), "id", "t",
                       min_words=20).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out.loc[0, "keep_gopher"] == 1
    assert out.loc[1, "keep_gopher"] == 0 and out.loc[1, "n_words"] == 4
    assert out.loc[2, "keep_gopher"] == 0
    assert out.loc[2, "symbol_ratio"] > 0.1
    assert out.loc[3, "bullet_frac"] == 1.0
    assert out.loc[4, "n_words"] == 0 and out.loc[4, "keep_gopher"] == 0

    # ellipsis line-end fraction
    e = pa.table({"id": pa.array([0], type=pa.int64()),
                  "t": ["first line...\nsecond line\nthird…"]})
    oe = gopher_flags(ray.data.from_arrow(e), "id", "t").to_pandas()
    assert abs(oe.loc[0, "ellipsis_frac"] - 0.6667) < 1e-9


def test_fuzzy_join_boilerplate_caps_surface(ray_session, capsys):
    """A boilerplate-heavy linkage corpus (every name shares every gram)
    trips the per-gram candidate cap: the join completes with bounded
    pair emission and prints the surfaced skip count instead of
    grinding O(n*m)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.linkage import fuzzy_join

    n = 60
    left = pa.table({"lid": pa.array(range(n), type=pa.int64()),
                     "lname": pa.array(["aaaa bbbb cccc"] * n)})
    right = pa.table({"rid": pa.array(range(n), type=pa.int64()),
                      "rname": pa.array(["aaaa bbbb cccc"] * n)})
    out = fuzzy_join(ray.data.from_arrow(left),
                     ray.data.from_arrow(right),
                     left_id="lid", left_text="lname",
                     right_id="rid", right_text="rname",
                     threshold=0.9, gram=3,
                     max_bucket=100).to_pandas()
    # every cross pair exceeds the cap in every bucket -> empty result,
    # no quadratic blowup; the run itself is the assertion (bounded)
    assert len(out) <= n * n


def test_strip_html_edge_cases(ray_session):
    from packs_ray.functions.webquality import strip_html

    rows = [
        {"doc_id": 0, "html": "<p>Hello <b>world</b></p>"},
        {"doc_id": 1, "html": "plain text, no tags"},
        {"doc_id": 2, "html": None},
        {"doc_id": 3,
         "html": '<script>if (1 < 2) emit("</div>");</script>after'},
        {"doc_id": 4, "html": "<STYLE>p{}</STYLE>a&amp;lt;b &nbsp;&#39;"},
        {"doc_id": 5, "html": "<div\nclass='x'>multi\nline</div>"},
        {"doc_id": 6, "html": "  spaced\t\tout  "},
        {"doc_id": 7, "html": "<br/><br/>"},
    ]
    out = (strip_html(_ds(rows), "html", id_cols=["doc_id"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = ["Hello world", "plain text, no tags", None, "after",
           "a&lt;b '", "multi line", "spaced out", ""]
    got = [None if v is None or v != v else v
           for v in out["text_extracted"]]
    assert got == exp


def test_fuzzy_decontam_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.webquality import fuzzy_decontam

    bench_ids = [100, 200]
    bench_texts = ["the quick brown fox jumps over the lazy dog",
                   "completely different benchmark content here"]
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog",  # exact
                 "the quick brown fox leaps over the lazy dog",  # near
                 "zzz qqq vvv unrelated",                        # none
                 None]})
    out = fuzzy_decontam(ray.data.from_arrow(docs), "doc_id", "text",
                         bench_ids, bench_texts,
                         threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["max_jaccard"][0] == 1.0 and bool(out["contaminated"][0])
    assert out["bench_id"][0] == 100
    assert 0.5 < out["max_jaccard"][1] < 1.0
    assert bool(out["contaminated"][1])
    assert out["max_jaccard"][2] == 0.0
    assert pd.isna(out["bench_id"][2]) and not bool(out["contaminated"][2])
    assert out["n_shingles"][3] == 0 and out["max_jaccard"][3] == 0.0


def test_fuzzy_decontam_empty_bench(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.webquality import fuzzy_decontam

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()), "text": ["abc def"]}))
    out = fuzzy_decontam(docs, "doc_id", "text", [], []).to_pandas()
    assert out["max_jaccard"][0] == 0.0
    assert not bool(out["contaminated"][0])


def test_c4_clean_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.webquality import c4_clean

    docs = pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "Good line stays here.\nshort.\nno terminal punct at all\n"
            "Uses some JavaScript code here.\nAnother keeper line!",
            "lorem ipsum dolor sit amet.",
            "var x = { a: 1 };\nReal sentence to keep right here.",
            ""])})
    out = c4_clean(ray.data.from_arrow(docs).repartition(2), "id",
                   "text").to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert out.loc[0, "text_clean"] == \
        "Good line stays here.\nAnother keeper line!"
    assert out.loc[0, "n_lines"] == 5 and out.loc[0, "n_kept"] == 2
    assert not out.loc[0, "dropped"]
    assert bool(out.loc[1, "dropped"])      # lorem ipsum page rule
    assert bool(out.loc[2, "dropped"])      # brace page rule
    assert out.loc[2, "text_clean"] == "Real sentence to keep right here."
    assert out.loc[3, "text_clean"] == "" and out.loc[3, "n_lines"] == 1


def test_curation_pipeline_stage_routing(ray_session):
    """run_curation_pipeline: each doc lands at its first failing stage,
    dedup keeps the min id per cleaned text, the quality gate is the
    exact survivor median, and kept docs get deterministic shards."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.pipelines.curation_pipeline import run_curation_pipeline

    good = ("the quick brown fox jumps over the lazy dog and then it "
            "runs far away to the hills beyond the river valley %d.")
    rows = {
        0: "lorem ipsum " + good % 0,          # clean (page rule)
        1: "no punct line here",               # clean (no terminal punct)
        2: "alpha beta gamma.",                # gopher (3 words < 20)
        3: good % 3,                           # survivor
        4: good % 3,                           # dedup (same cleaned text)
        5: good % 5,                           # survivor
        6: good % 6 + " ### ### ### ### ### ### ### ### ### ###.",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(rows), "text": list(rows.values())})).repartition(3)
    out = run_curation_pipeline(ds, min_words=10).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "stage"] == "clean"
    assert out.loc[1, "stage"] == "clean"
    assert out.loc[2, "stage"] == "gopher"
    assert out.loc[4, "stage"] == "dedup"       # 3 is the canonical
    assert out.loc[6, "stage"] == "gopher"      # symbol ratio
    surv = out.loc[[3, 5]]
    assert set(surv["stage"]) <= {"kept", "quality"}
    assert (surv["stage"] == "kept").sum() >= 1   # median gate keeps >= 1
    kept = out[out["stage"] == "kept"]
    assert kept["shard"].notna().all()
    assert out[out["stage"] != "kept"]["shard"].isna().all()
    # deterministic: rerun equals
    out2 = run_curation_pipeline(ds, min_words=10).to_pandas() \
        .set_index("doc_id")
    assert out.equals(out2)
