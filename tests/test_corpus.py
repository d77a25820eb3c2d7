"""Corpus-statistics operators: top-k tokens, exact quantile histogram, hash sampling."""

import re

import pandas as pd
import numpy as np
import pyarrow as pa
import pytest

from scala_timeseries_lib_ray.pipelines.corpus import (
    hash_sample,
    token_topk,
    value_quantiles,
)
from scala_timeseries_lib_ray.pipelines.dataprep import md5_u64


def _docs_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def test_token_topk_counts_and_tiebreak(ray_session):
    import ray.data

    texts = ["a b b c", "B c! c?", "zz a", ""]
    # counts: a=2 b=3 c=3 zz=1 -> top3 by (cnt desc, word asc) = b, c, a
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(3)
    out = token_topk(ds, k=3).to_pandas()
    assert list(out["word"]) == ["b", "c", "a"]
    assert list(out["cnt"]) == [3, 3, 2]


def test_token_topk_matches_python_reference(ray_session):
    import collections

    import ray.data

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)).tolist()) for _ in range(200)
    ]
    ref = collections.Counter()
    for s in texts:
        ref.update(w for w in re.split(r"[^a-z0-9]+", s.lower()) if w)
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(4)
    out = token_topk(ds, k=10).to_pandas()
    assert list(zip(out["word"], out["cnt"])) == expect


@pytest.mark.parametrize("n_rows", [1, 7, 100])
def test_value_quantiles_matches_sorted_rank(ray_session, n_rows):
    import ray.data

    rng = np.random.default_rng(n_rows)
    keys = rng.choice(["a", "b", "c"], size=n_rows)
    vals = rng.integers(0, 50, size=n_rows).astype(np.int64)
    t = pa.table({"source": pa.array(keys), "n_chars": pa.array(vals)})
    out = (
        value_quantiles(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    for k in np.unique(keys):
        v = np.sort(vals[keys == k])
        n = len(v)
        assert out.loc[k, "n"] == n
        for p, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank = max(1, int(np.ceil(p * n)))  # smallest value with CDF >= p
            assert out.loc[k, name] == v[rank - 1], (k, name)


def test_hash_sample_partition_of_corpus(ray_session):
    import ray.data

    ids = np.arange(97, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "x": pa.array(ids * 3)})
    ds = ray.data.from_arrow(t).repartition(4)
    parts = [
        set(hash_sample(ds, mod=4, keep=k).to_pandas()["doc_id"]) for k in range(4)
    ]
    # disjoint, complete, and each bucket matches the direct hash rule
    assert sorted(x for p in parts for x in p) == list(ids)
    h = md5_u64([str(i) for i in ids])
    for k in range(4):
        assert parts[k] == set(ids[(h % np.uint64(4)) == np.uint64(k)])


def test_corpus_ops_duckdb_parity_fuzz(ray_session):
    """Random ASCII corpora: token_topk / value_quantiles / hash_sample vs DuckDB
    (the same closed forms the driver oracle uses), independent of the testdata."""
    import duckdb
    import ray.data

    rng = np.random.default_rng(123)
    chars = np.array(list("abc12 .!-\t"))
    for trial in range(3):
        n = int(rng.integers(5, 60))
        texts = [
            "".join(rng.choice(chars, size=rng.integers(0, 40))) for _ in range(n)
        ]
        srcs = rng.choice(["s1", "s2"], size=n)
        lens = rng.integers(0, 9, size=n).astype(np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "source": pa.array(srcs),
                "n_chars": pa.array(lens),
            }
        )
        con = duckdb.connect()
        con.register("documents", t)
        ds = ray.data.from_arrow(t).repartition(3)

        topk = token_topk(ds, k=5).to_pandas()
        ref = con.execute(
            "WITH w AS (SELECT u.w AS word FROM (SELECT regexp_extract_all(lower(text),"
            " '[a-z0-9]+') AS ws FROM documents) d, unnest(d.ws) u(w)),"
            " c AS (SELECT word, COUNT(*)::BIGINT AS cnt FROM w GROUP BY 1)"
            " SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 5"
        ).df()
        assert list(topk["word"]) == list(ref["word"]) and list(topk["cnt"]) == list(
            ref["cnt"]
        ), trial

        qs = (
            value_quantiles(ds, key="source", value_col="n_chars")
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        refq = con.execute(
            "SELECT source, COUNT(*)::BIGINT AS n, quantile_disc(n_chars, 0.5) AS p50,"
            " quantile_disc(n_chars, 0.9) AS p90, quantile_disc(n_chars, 0.99) AS p99"
            " FROM documents GROUP BY 1 ORDER BY source"
        ).df()
        assert (qs.values == refq.values).all(), trial

        samp = hash_sample(ds, mod=3, keep=1).to_pandas()
        refs = con.execute(
            "SELECT doc_id FROM documents WHERE md5_number_lower(doc_id::VARCHAR) % 3 = 1"
        ).df()
        assert sorted(samp["doc_id"]) == sorted(refs["doc_id"]), trial


def test_token_trends_per_bucket_topk(ray_session):
    import collections

    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import token_trends

    rng = np.random.default_rng(11)
    n = 300
    ts = rng.integers(0, 5 * 60_000, size=n).astype(np.int64)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 8))) for _ in range(n)]
    t = pa.table({"ts": pa.array(ts), "text": pa.array(texts)})
    out = token_trends(
        ray.data.from_arrow(t).repartition(4), width=60_000, k=2
    ).to_pandas()
    # python reference
    ref = collections.defaultdict(collections.Counter)
    for tsi, txt in zip(ts, texts):
        b = (tsi // 60_000) * 60_000
        ref[b].update(w for w in re.split(r"[^a-z0-9]+", txt.lower()) if w)
    expect = []
    for b in sorted(ref):
        top = sorted(ref[b].items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        expect += [(b, w, c) for w, c in top]
    got = sorted(zip(out["bucket_ts"], out["word"], out["cnt"]))
    assert got == sorted(expect)


def test_token_topk_groupby_combine_matches_tree(ray_session):
    """combine='groupby' (word-hash exchange, bounded root) is value-identical
    to the tree combine — the unbounded-key-space path stays exact."""
    import ray.data

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 25)).tolist()) for _ in range(300)
    ]
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(5)
    tree = token_topk(ds, k=12).to_pandas()
    grp = token_topk(ds, k=12, combine="groupby").to_pandas()
    assert list(zip(tree["word"], tree["cnt"])) == list(zip(grp["word"], grp["cnt"]))


def test_token_trends_groupby_combine_matches_tree(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import token_trends

    rng = np.random.default_rng(29)
    n = 400
    ts = rng.integers(0, 4 * 60_000, size=n).astype(np.int64)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 9))) for _ in range(n)]
    t = pa.table({"ts": pa.array(ts), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(4)
    tree = token_trends(ds, width=60_000, k=2).to_pandas()
    grp = token_trends(ds, width=60_000, k=2, combine="groupby").to_pandas()
    assert sorted(zip(tree["bucket_ts"], tree["word"], tree["cnt"])) == sorted(
        zip(grp["bucket_ts"], grp["word"], grp["cnt"])
    )


def test_repetition_stats_matches_python(ray_session):
    import collections

    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import repetition_stats

    rng = np.random.default_rng(31)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 12))) for _ in range(150)]
    texts += ["", "solo", "x y", "loop loop loop loop", "a b a b a b a b"]
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(4)
    out = repetition_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        ws = [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
        cnt = collections.Counter(ws)
        bgs = collections.Counter(zip(ws, ws[1:]))
        r = out.iloc[i]
        assert r["n_words"] == len(ws)
        assert r["n_distinct"] == len(cnt)
        assert r["top_word_cnt"] == (max(cnt.values()) if cnt else 0)
        assert r["n_bigrams"] == max(len(ws) - 1, 0)
        assert r["top_bigram_cnt"] == (max(bgs.values()) if bgs else 0)
        assert r["top_word_frac"] == (max(cnt.values()) if cnt else 0) / max(len(ws), 1)
        assert r["distinct_ratio"] == len(cnt) / max(len(ws), 1)
        assert r["top_bigram_frac"] == (max(bgs.values()) if bgs else 0) / max(len(ws) - 1, 1)


def test_duplicate_ngrams_matches_python(ray_session):
    import collections

    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import duplicate_ngrams

    rng = np.random.default_rng(37)
    vocab = ["aa", "bb", "cc"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 15))) for _ in range(200)]
    texts += ["boiler plate text here " * 5, "boiler plate text here and more", "short"]
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(4)
    ref = collections.Counter()
    n = 3
    for s in texts:
        ws = [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
        for i in range(len(ws) - n + 1):
            ref[" ".join(ws[i : i + n])] += 1
    expect = sorted(
        ((g, c) for g, c in ref.items() if c >= 2), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    for combine in ("hash2pass", "tree", "groupby"):
        out = duplicate_ngrams(ds, n=3, min_count=2, k=20, combine=combine).to_pandas()
        assert list(zip(out["gram"], out["cnt"])) == expect, combine


def test_repetition_dupngrams_duckdb_parity_fuzz(ray_session):
    """Random ASCII corpora: repetition_stats / duplicate_ngrams vs DuckDB (the
    driver-oracle closed forms), independent of the testdata tables."""
    import duckdb
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import (
        duplicate_ngrams,
        repetition_stats,
    )

    rng = np.random.default_rng(321)
    chars = np.array(list("ab1 .x"))
    for trial in range(3):
        n = int(rng.integers(5, 50))
        texts = ["".join(rng.choice(chars, size=rng.integers(0, 35))) for _ in range(n)]
        texts += ["a b a b a b", "a b a b a b"]  # guaranteed cross-doc dup 3-grams
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        con = duckdb.connect()
        con.register("documents", t)
        ds = ray.data.from_arrow(t).repartition(3)

        rs = (
            repetition_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        ref = con.execute(
            """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
uni AS (SELECT doc_id, u.w AS word, COUNT(*)::BIGINT AS c FROM w, unnest(ws) u(w) GROUP BY 1, 2),
us AS (SELECT doc_id, COUNT(*)::BIGINT AS n_distinct, MAX(c) AS top_word_cnt,
              SUM(c)::BIGINT AS n_words FROM uni GROUP BY 1),
bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b, COUNT(*)::BIGINT AS c
       FROM w, unnest(range(1, len(ws))) t(i) GROUP BY 1, 2),
bs AS (SELECT doc_id, MAX(c) AS top_bigram_cnt FROM bg GROUP BY 1)
SELECT d.doc_id,
       COALESCE(us.n_words, 0)::BIGINT AS n_words,
       COALESCE(us.n_distinct, 0)::BIGINT AS n_distinct,
       COALESCE(us.top_word_cnt, 0)::BIGINT AS top_word_cnt,
       GREATEST(COALESCE(us.n_words, 0) - 1, 0)::BIGINT AS n_bigrams,
       COALESCE(bs.top_bigram_cnt, 0)::BIGINT AS top_bigram_cnt
FROM documents d LEFT JOIN us USING (doc_id) LEFT JOIN bs USING (doc_id)
ORDER BY doc_id
"""
        ).df()
        for col in ("n_words", "n_distinct", "top_word_cnt", "n_bigrams", "top_bigram_cnt"):
            assert list(rs[col]) == list(ref[col]), (trial, col)

        dg = duplicate_ngrams(ds, n=3, min_count=2, k=10).to_pandas()
        ref2 = con.execute(
            """
WITH w AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      FROM w, unnest(range(1, len(ws) - 1)) t(i)),
c AS (SELECT gram, COUNT(*)::BIGINT AS cnt FROM g GROUP BY 1)
SELECT gram, cnt FROM c WHERE cnt >= 2 ORDER BY cnt DESC, gram LIMIT 10
"""
        ).df()
        assert list(dg["gram"]) == list(ref2["gram"]) and list(dg["cnt"]) == list(
            ref2["cnt"]
        ), trial


def test_salient_terms_duckdb_parity_fuzz(ray_session):
    import duckdb
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import salient_terms

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(60)]
    texts, srcs = [], []
    for i in range(300):
        # skew the vocab per source so ratios differ
        s = f"s{i % 4}"
        lo = (i % 4) * 12
        words = rng.choice(vocab[lo : lo + 30], size=rng.integers(1, 40))
        texts.append(" ".join(words.tolist()))
        srcs.append(s)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(srcs),
        }
    )
    ds = ray.data.from_arrow([t.slice(i, 50) for i in range(0, 300, 50)])
    out = (
        salient_terms(ds, k=7)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    ora = con.execute(
        """
        WITH toks AS (
          SELECT doc_id, source, u.w AS word
          FROM (SELECT doc_id, source,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents) d, unnest(d.ws) u(w)
        ), tf AS (SELECT source, word, COUNT(*)::BIGINT AS tf FROM toks GROUP BY 1,2),
           df AS (SELECT word, COUNT(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1),
        scored AS (
          SELECT tf.source, tf.word, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.source
                     ORDER BY CAST(tf.tf AS DOUBLE)/df.df DESC, tf.word) AS r
          FROM tf JOIN df USING (word))
        SELECT source, CAST(r AS BIGINT) AS "rank", word, tf, df
        FROM scored WHERE r <= 7 ORDER BY source, r
        """
    ).df()
    assert out.equals(ora)


def test_doc_top_terms_matches_bruteforce(ray_session):
    import re

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import doc_top_terms

    texts = [
        "apple apple banana cherry",          # tf tie banana/cherry -> df breaks
        "banana banana cherry date date date",
        "cherry eagle eagle",
        "",                                   # empty -> no rows
        "apple banana cherry date eagle fig", # all tf=1 -> df then term order
    ]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)), "text": pa.array(texts)})
    ds = ray.data.from_arrow([t.slice(i, 2) for i in range(0, 5, 2)])
    got = (
        doc_top_terms(ds, k=3)
        .to_pandas()
        .sort_values(["doc_id", "term_rank"])
        .reset_index(drop=True)
    )
    # brute force
    docs = {i: re.findall(r"[a-z0-9]+", s.lower()) for i, s in enumerate(texts)}
    df: dict[str, int] = {}
    for ws in docs.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    rows = []
    for i, ws in docs.items():
        tf: dict[str, int] = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:3]
        for r, (w, c) in enumerate(ranked, 1):
            rows.append((i, w, c, df[w], r))
    want = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df", "term_rank"])
    pd.testing.assert_frame_equal(got, want)
    with pytest.raises(ValueError):
        doc_top_terms(ds, k=0)


def _brute_dedup_lines(rows, min_count=2, min_len=10):
    """Python mirror: global line counts over eligible lines, keep the first
    occurrence by (doc_id, idx), rebuild texts."""
    occ = {}
    for doc_id, text in rows:
        for i, line in enumerate(text.split("\n")):
            if len(line) >= min_len:
                occ.setdefault(line, []).append((doc_id, i))
    drops = set()
    for line, ks in occ.items():
        if len(ks) >= min_count:
            drops.update(sorted(ks)[1:])
    out = []
    for doc_id, text in rows:
        kept = [
            line
            for i, line in enumerate(text.split("\n"))
            if (doc_id, i) not in drops
        ]
        nd = len(text.split("\n")) - len(kept)
        out.append((doc_id, "\n".join(kept), nd))
    return pd.DataFrame(out, columns=["doc_id", "text", "n_dropped"])


def test_dedup_lines_matches_bruteforce(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import dedup_lines

    rows = [
        (0, "the same boilerplate line here\nunique alpha content first doc"),
        (1, "unique beta content\nthe same boilerplate line here\nshort"),  # drop l1
        (2, "the same boilerplate line here\nthe same boilerplate line here"),  # both drop (0 wins)
        (3, "singleton line long enough\n\ntrailing empty kept\n"),
        (4, "short\nshort\nshort"),  # below min_len: never deduped
        (5, "unique gamma content doc five"),
        # 5 CHARS but 10 utf-8 BYTES: ineligible under the documented char
        # semantics (ADVICE r04 — binary_length would have deduped it)
        (6, "ééééé\nunique delta content doc six"),
        (7, "ééééé\nunique epsilon content doc seven"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    ds = ray.data.from_arrow([t.slice(i, 2) for i in range(0, len(rows), 2)])
    got = (
        dedup_lines(ds, min_count=2, min_len=10, n_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_dedup_lines(rows)
    pd.testing.assert_frame_equal(got, want)
    byid = got.set_index("doc_id")
    assert byid.loc[0, "n_dropped"] == 0  # global winner keeps its line
    assert byid.loc[1, "n_dropped"] == 1
    assert byid.loc[2, "n_dropped"] == 2  # within-doc repeats both lose to doc 0
    assert byid.loc[4, "n_dropped"] == 0  # short lines ineligible
    assert byid.loc[3, "text"] == rows[3][1]  # empty/trailing lines loss-free
    assert byid.loc[7, "n_dropped"] == 0  # 5-char/10-byte line: char semantics


def test_dedup_lines_fuzz_vs_bruteforce(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import dedup_lines

    rng = np.random.default_rng(23)
    pool = [f"boilerplate line number {i} with padding" for i in range(12)]
    rows = []
    for d in range(120):
        n = rng.integers(0, 6)
        lines = [pool[j] for j in rng.integers(0, 12, n)]
        if rng.random() < 0.3:
            lines.append(f"unique to doc {d} with enough length")
        if rng.random() < 0.2:
            lines.append("tiny")
        rows.append((d, "\n".join(lines)))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    ds = ray.data.from_arrow([t.slice(i, 37) for i in range(0, len(rows), 37)])
    for mc in (2, 4):
        got = (
            dedup_lines(ds, min_count=mc, min_len=10, n_parts=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, _brute_dedup_lines(rows, min_count=mc))


def _brute_dedup_spans(rows, n=5, min_count=2):
    tok = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    occ = {}
    for d, ws in tok.items():
        for p in range(len(ws) - n + 1):
            occ.setdefault(tuple(ws[p : p + n]), []).append((d, p))
    cover = {d: [False] * len(ws) for d, ws in tok.items()}
    for span, ks in occ.items():
        if len(ks) >= min_count:
            for d, p in sorted(ks)[1:]:
                for i in range(p, p + n):
                    cover[d][i] = True
    out = []
    for d, ws in tok.items():
        kept = [w for w, c in zip(ws, cover[d]) if not c]
        out.append((d, " ".join(kept), len(ws), len(ws) - len(kept)))
    return pd.DataFrame(out, columns=["doc_id", "text", "n_tokens", "n_removed"])


def test_dedup_spans_matches_bruteforce(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import dedup_spans

    rows = [
        (0, "alpha beta gamma delta epsilon zeta unique tail zero"),
        (1, "prefix one alpha beta gamma delta epsilon zeta suffix"),  # span dup of 0
        (2, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"),  # overlapping dups
        (3, "tiny doc"),  # shorter than n -> untouched
        (4, "totally different words without any shared span content"),
        (5, ""),  # empty
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    ds = ray.data.from_arrow([t.slice(i, 2) for i in range(0, len(rows), 2)])
    got = (
        dedup_spans(ds, n=5, min_count=2, n_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_dedup_spans(rows)
    pd.testing.assert_frame_equal(got, want)
    byid = got.set_index("doc_id")
    assert byid.loc[0, "n_removed"] == 0  # global winner untouched
    assert byid.loc[1, "n_removed"] >= 5  # the copied span's tokens dropped
    assert byid.loc[2, "n_removed"] > 0  # within-doc overlap handled
    assert byid.loc[3, "n_removed"] == 0 and byid.loc[5, "n_tokens"] == 0


def test_dedup_spans_fuzz_vs_bruteforce(ray_session):
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import dedup_spans

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(25)]  # tiny vocab -> real repeated 4-spans
    rows = [
        (d, " ".join(rng.choice(vocab, rng.integers(0, 30)))) for d in range(150)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    ds = ray.data.from_arrow([t.slice(i, 41) for i in range(0, len(rows), 41)])
    for n, mc in ((4, 2), (3, 3)):
        got = (
            dedup_spans(ds, n=n, min_count=mc, n_parts=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, _brute_dedup_spans(rows, n=n, min_count=mc))


def test_membership_views_split_stitched_runs(ray_session):
    """Blocks concatenate multiple map_groups outputs; same-part rows from
    different groups stitch adjacent with a descending key step. Views must
    split there (regression: a fused unsorted 'run' made binary-search probes
    miss drop keys in dedup_spans/dedup_lines)."""
    import ray

    from scala_timeseries_lib_ray.pipelines.corpus import (
        _membership_views,
        _probe_sorted_runs,
    )

    # one block = group A's [part 2: keys 50, 60] then group B's [part 2: 10, 40]
    t = pa.table(
        {
            "part": pa.array([2, 2, 2, 2], pa.int32()),
            "h": pa.array([50, 60, 10, 40], pa.int64()),
        }
    )
    ref = ray.put(t)
    views = _membership_views((ref,))
    assert len(views[2]) == 2  # split at the 60 -> 10 stitch
    for probe in (10, 40, 50, 60):
        got = _probe_sorted_runs(views[2], np.array([probe], np.uint64))
        assert got[0], f"probe missed key {probe}"
    assert not _probe_sorted_runs(views[2], np.array([55], np.uint64))[0]


def test_token_rarity_planted(ray_session):
    """token_rarity vs a hand-computed corpus: corpus counts are instance
    counts (not df), thresholds are inclusive, min_cnt is the rarest token's
    corpus count, token-less docs are dropped, custom thresholds name their
    columns."""
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import token_rarity

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "apple apple banana",   # apple x2 here (+1 in doc1) -> c=3
                    "apple cherry",         # cherry unique -> c=1
                    "banana banana kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi kiwi",
                    "?!",                   # no tokens -> dropped
                ]
            ),
        }
    )
    # corpus counts: apple=3, banana=3, cherry=1, kiwi=9
    out = (
        token_rarity(ray.data.from_arrow(t).repartition(2), thresholds=(1, 5))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2]
    assert out.loc[0].tolist() == [3, 0, 3, 3]      # n_tokens, n_rare_1, n_rare_5, min_cnt
    assert out.loc[1].tolist() == [2, 1, 2, 1]      # cherry is a hapax
    assert out.loc[2].tolist() == [11, 0, 2, 3]     # 9 kiwis over threshold 5
    with pytest.raises(ValueError):
        token_rarity(ray.data.from_arrow(t), thresholds=())


def test_cross_source_dups_planted(ray_session):
    """cross_source_dups vs a hand corpus: counts DISTINCT shared contents per
    unordered pair, case-insensitive, within-source duplicates alone don't
    pair, dup-free corpus yields 0 rows with a stable schema."""
    import ray.data

    from scala_timeseries_lib_ray.pipelines.corpus import cross_source_dups

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b", "b", "c", "c", "a"]),
            "text": pa.array(
                [
                    "Hello World",   # a: shared with b (case-insensitive)
                    "only in a",
                    "hello world",   # b
                    "twins",         # b: shared with c
                    "twins",         # c
                    "twins",         # c again (within-source dup, still 1 content)
                    "only in a",     # within-a dup only -> no pair
                ]
            ),
        }
    )
    out = (
        cross_source_dups(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    assert out.to_records(index=False).tolist() == [("a", "b", 1), ("b", "c", 1)]
    nodup = pa.table(
        {"source": pa.array(["a", "b"]), "text": pa.array(["x1", "x2"])}
    )
    empty = cross_source_dups(ray.data.from_arrow(nodup))
    # (Ray's to_pandas drops columns on 0-row datasets; the dataset-level
    # schema is the stable contract the seed union guarantees)
    assert sorted(empty.schema().names) == ["n_shared", "source_a", "source_b"]
    assert empty.count() == 0
