"""Edge-case battery for the text column-function library: empty/whitespace/
unicode/single-token inputs through every function in one Spark job, with
expected values computed independently in Python."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sqldataintegrationfunctiontriggerapp_spark.functions import text as TX

ROWS = [
    (1, ""),                              # empty
    (2, "   \t  "),                       # whitespace only
    (3, "word"),                          # single token (no bigram)
    (4, "a b"),                           # exactly one bigram
    (5, "the the the the"),               # maximal repetition
    (6, "mail me@example.com or 10.1.2.3 at 555-1234"),  # all three PII kinds
    (7, "汉字 text mixed"),                # CJK short-circuit
    (8, "Tabs\tand\nnewlines   spaced"),  # mixed whitespace
]


def test_text_function_edge_cases(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TX.token_count("text").alias("n"),
            TX.bigrams("text").alias("bg"),
            TX.fingerprint("text").alias("fp"),
            TX.lang_id("text").alias("lang"),
            TX.pii_mask("text").alias("masked"),
            TX.pii_counts("text")["n_emails"].alias("n_emails"),
        ).collect()
    }
    # token counts: empty and whitespace-only yield zero tokens
    assert [got[i].n for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 2, 4]
    # bigrams: below 2 tokens -> empty array, never null
    assert got[1].bg == [] and got[2].bg == [] and got[3].bg == []
    assert got[4].bg == ["a b"]
    assert got[5].bg == ["the the"] * 3
    assert got[8].bg == ["Tabs and", "and newlines", "newlines spaced"]
    # fingerprint: whitespace-insensitive normalization
    assert got[8].fp == hashlib.md5(b"tabs and newlines spaced").hexdigest()
    assert got[1].fp == hashlib.md5(b"").hexdigest()
    # lang id: CJK short-circuit beats stopword votes
    assert got[7].lang == "zh"
    assert got[5].lang == "en"
    # PII masking hits every rule; non-PII text is untouched
    assert got[6].masked == "mail <EMAIL> or <IP> at <PHONE>"
    assert got[6].n_emails == 1
    assert got[5].masked == "the the the the"


def test_quality_score_bounds(spark, sf_dir):
    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    row = d.select(
        F.min(TX.quality_score("text")).alias("lo"),
        F.max(TX.quality_score("text")).alias("hi"),
    ).first()
    assert 0.0 <= row.lo <= row.hi <= 1.0


def test_cms_heavy_hitters_sketch_properties(spark, sf_dir):
    """CMS guarantees that survive any (width, depth, data): estimates never
    undercount, the top hitter's estimate is bounded by the total token
    count, and the reported exact counts agree with a direct word count."""
    from sqldataintegrationfunctiontriggerapp_spark.catalog import load_table
    from sqldataintegrationfunctiontriggerapp_spark.plans.text import (
        cms_heavy_hitters,
    )

    got = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(got) == 20
    assert all(r.never_undercounts for r in got)
    assert all(r.cms_n >= r.exact_n for r in got)
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(TX.tokens("text")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    exact = {r.t: r["count"] for r in counts}
    total = sum(exact.values())
    for r in got:
        assert exact[r.term] == r.exact_n
        assert r.cms_n <= total
    # the list really is the global top-20 by exact count (term tiebreak)
    expected_top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.term, r.exact_n) for r in got] == expected_top


def test_of_tokens_variants_match_text_path(spark):
    """Direct pin for the *_of_tokens helpers (VERDICT r07 #4): feeding a
    PRE-TOKENIZED array<string> column must equal the text-input path on
    the same strings. The text functions delegate to the token variants, so
    this pins the delegation contract from the caller's side -- a future
    tokenize-once pipeline (pandas-UDF BPE) hands the helpers an array
    column directly and relies on exactly this equivalence. Strings are a
    deterministic pseudo-random mix (seeded md5 word soup) plus the edge
    rows above; tokenization is replicated in Python with the same
    split-and-drop-empties semantics."""
    import re

    rng_words = [
        hashlib.md5(f"w{i}".encode()).hexdigest()[: (i % 7) + 1] for i in range(40)
    ]
    texts = [t for _, t in ROWS] + [
        " ".join(rng_words[i : i + (i % 9) + 1]) + ("  " if i % 3 else "\t the ")
        for i in range(0, 40, 3)
    ]
    rows = [(i, t, [w for w in re.split(r"\s+", t) if w != ""]) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string, toks array<string>")
    got = df.select(
        TX.mean_token_length("text").alias("m_text"),
        TX.mean_token_length_of_tokens(F.col("toks")).alias("m_toks"),
        TX.stopword_count("text").alias("s_text"),
        TX.stopword_count_of_tokens(F.col("toks")).alias("s_toks"),
        TX.bigrams("text").alias("b_text"),
        TX.bigrams_of_tokens(F.col("toks")).alias("b_toks"),
    ).collect()
    for r in got:
        assert r.m_text == r.m_toks
        assert r.s_text == r.s_toks
        assert r.b_text == r.b_toks


def test_misra_gries_matches_python_reference(spark, sf_dir):
    """Independent reference for misra_gries_topk: replicate the shard ->
    reduce -> merge -> reduce algebra in plain Python from the raw parquet
    and compare every output cell, then assert the MG contracts that hold
    for ANY input: counters never overcount, err_subtracted is the exact
    per-term estimation error, and every term whose true count exceeds its
    shard threshold plus the final threshold survives."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from sqldataintegrationfunctiontriggerapp_spark.plans import QUERIES
    from sqldataintegrationfunctiontriggerapp_spark.plans.text import (
        _MG_K,
        _MG_SHARDS,
    )

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    counts = Counter(
        t for s in texts for t in re.split(r"\s+", s) if t != ""
    )

    def shard(term: str) -> int:
        h = hashlib.md5(term.encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % _MG_SHARDS

    shards: dict[int, list] = {}
    for term, n in counts.items():
        shards.setdefault(shard(term), []).append((term, n))
    kept = []
    thresholds = {}
    for sh, items in shards.items():
        items.sort(key=lambda kv: (-kv[1], kv[0]))
        t_shard = items[_MG_K][1] if len(items) > _MG_K else 0
        thresholds[sh] = t_shard
        kept += [
            (term, n, n - t_shard, t_shard)
            for term, n in items[:_MG_K]
            if n - t_shard > 0
        ]
    kept.sort(key=lambda row: (-row[2], row[0]))
    t_final = kept[_MG_K][2] if len(kept) > _MG_K else 0
    expected = sorted(
        (
            (term, n, c - t_final, t_sh + t_final, c - t_final <= n)
            for term, n, c, t_sh in kept[:_MG_K]
            if c - t_final > 0
        ),
        key=lambda row: (-row[1], row[0]),
    )

    got = [tuple(r) for r in QUERIES["misra_gries_topk"](spark, sf_dir).collect()]
    assert got == expected
    for term, exact_n, mg_n, err, never_over in got:
        assert never_over and mg_n <= exact_n
        assert exact_n - mg_n == err  # the error accounting is exact
    # completeness: any term beating its shard threshold + the final
    # threshold is guaranteed to survive both reductions
    survivors = {r[0] for r in got}
    for term, n in counts.items():
        if n > thresholds.get(shard(term), 0) + t_final:
            assert term in survivors


def test_lm_bigram_score_matches_python_reference(spark, sf_dir):
    """Independent reference for lm_bigram_score: rebuild the corpus-trained
    Laplace-smoothed bigram model in plain Python from the raw parquet and
    compare every output cell bit-for-bit, including the DECIMAL(18,6)
    accumulator rounding of the per-doc mean. Independent of BOTH engines:
    a shared semantic mistake in the Spark plan and its translated oracle
    SQL would survive the hash gate but fail here."""
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    from sqldataintegrationfunctiontriggerapp_spark.plans import QUERIES

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    toks = {
        i: [t for t in re.split(r"\s+", s) if t != ""]
        for i, s in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    c2: Counter = Counter()
    vocab: set = set()
    for tk in toks.values():
        vocab.update(tk)
        c2.update(zip(tk, tk[1:]))
    c1: Counter = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    v = len(vocab)
    q6 = Decimal("0.000001")
    expected = {}
    for i, tk in toks.items():
        if len(tk) < 2:  # no bigrams -> no output row (explode drops it)
            continue
        ps = [(c2[(a, b)] + 1) / (c1[a] + v) for a, b in zip(tk, tk[1:])]
        # the engines cast each double p to DECIMAL(18,6) by rounding the
        # SHORTEST decimal representation of the double (Spark routes the
        # cast through Double.toString -> BigDecimal, and DuckDB agrees),
        # NOT the exact binary expansion -- Decimal(repr(p)) models that
        # (repr is Python's shortest round-trip form); Decimal(p) would
        # diverge on values like 7/2e6 whose exact expansion sits below
        # the .5 boundary their shortest form is exactly on
        s = sum(Decimal(repr(p)).quantize(q6, ROUND_HALF_UP) for p in ps)
        expected[i] = (len(ps), float(s) / len(ps))
    got = {
        r.doc_id: (r.n_bigrams, r.mean_p)
        for r in QUERIES["lm_bigram_score"](spark, sf_dir).collect()
    }
    assert got == expected


def test_weighted_systematic_sample_matches_python_reference(spark, sf_dir):
    """Independent reference for weighted_systematic_sample: replicate the
    md5-ordered cumulative-weight boundary walk in plain Python (pure
    integer arithmetic, like both engines) and compare every row. Also
    asserts the PPS contracts: at most k picks per source, every pick has
    positive weight, and pick_idx is strictly increasing within a source."""
    import hashlib as _hl
    from collections import defaultdict

    import pyarrow.parquet as pq

    from sqldataintegrationfunctiontriggerapp_spark.plans import QUERIES

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    rows = list(
        zip(
            tbl["doc_id"].to_pylist(),
            tbl["source"].to_pylist(),
            tbl["n_chars"].to_pylist(),
        )
    )
    by_source = defaultdict(list)
    for doc_id, source, n_chars in rows:
        by_source[source].append((doc_id, n_chars))
    k = 5
    expected = set()
    for source, items in by_source.items():
        items.sort(key=lambda r: (_hl.md5(str(r[0]).encode()).hexdigest(), r[0]))
        total = sum(n for _, n in items)
        if total <= 0:
            continue
        cum = 0
        for doc_id, n_chars in items:
            before, after = cum, cum + n_chars
            cum = after
            if (after * k) // total > (before * k) // total:
                expected.add((source, doc_id, n_chars, (after * k) // total))
    got = {
        (r.source, r.doc_id, r.n_chars, r.pick_idx)
        for r in QUERIES["weighted_systematic_sample"](spark, sf_dir).collect()
    }
    assert got == expected
    per_source = defaultdict(list)
    for source, _, n_chars, idx in got:
        assert n_chars > 0
        per_source[source].append(idx)
    for idxs in per_source.values():
        assert len(idxs) <= k and sorted(set(idxs)) == sorted(idxs)


def test_text_chunk_overlap_matches_python_reference(spark, sf_dir):
    """Pin text_chunk_overlap's window grid against an independent Python
    chunker on the real fixture: (a) identical (doc_id, chunk_id, start,
    text) set, (b) full token coverage, (c) no window fully contained in
    its predecessor (the start-grid construction's whole point), and
    (d) docs with <= W tokens yield exactly one chunk."""
    import re

    from sqldataintegrationfunctiontriggerapp_spark.plans.text import (
        _CHUNK_S,
        _CHUNK_W,
        text_chunk_overlap,
    )

    W, S = _CHUNK_W, _CHUNK_S
    got = {
        (r.doc_id, r.chunk_id): (r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in text_chunk_overlap(spark, sf_dir).collect()
    }

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text or "") if t]
        n = len(toks)
        if n == 0:
            continue
        starts = list(range(0, max(n - W + S - 1, 0) + 1, S))
        for cid, st in enumerate(starts):
            chunk = toks[st : st + W]
            want[(doc_id, cid)] = (st, len(chunk), " ".join(chunk))
        # (c): every later window strictly extends coverage -- no window is
        # contained in its predecessor
        ends = [min(st + W, n) for st in starts]
        assert all(b > a for a, b in zip(ends, ends[1:]))
        # (b): full coverage -- windows start at 0, overlap (S <= W), and
        # the last one reaches the final token
        assert starts[0] == 0 and S <= W and ends[-1] == n
        # (d)
        if n <= W:
            assert len(starts) == 1

    assert got == want


def test_bpe_vocab_induction_matches_python_reference(spark, sf_dir):
    """Pin the learned merge table against an independent Python BPE
    (Sennrich-style: frequency-weighted pair counts over word types,
    deterministic (count desc, pair asc) argmax, greedy LEFTMOST merge
    application) -- validates the aggregate()-fold's greedy semantics
    including the run-parity case ('aaa' merges positions 1-2, not 2-3)."""
    import re
    from collections import Counter

    import duckdb

    import __spark_entry__ as entrymod

    got = sorted(
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in entrymod.queries()["bpe_vocab_induction"](
            spark, sf_dir
        ).collect()
    )

    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    freqs = Counter()
    for (text,) in rows:
        for tok in re.split(r"\s+", text or ""):
            w = tok.lower()
            if w and re.fullmatch(r"[a-z]+", w):
                freqs[w] += 1
    seqs = {w: list(w) for w in freqs}
    want = []
    for rnd in range(1, 6):
        counts = Counter()
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] += freqs[w]
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rnd, l, r, cnt))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    assert got == sorted(want)


def test_bpe_checkpointed_chain_identical_to_lazy(spark, sf_dir):
    """The production (per-round localCheckpoint, linear-plan) chain must
    learn the identical merge table AND produce the identical final
    segmentation as the fully-lazy 2^R chain at equal R -- the pin that
    lets production runs at R~10^3 trust the R=5 oracle evidence."""
    from sqldataintegrationfunctiontriggerapp_spark.plans import text as T

    lazy_outs, lazy_cur = T._bpe_chain(spark, sf_dir)
    ck_outs, ck_cur = T.bpe_chain_checkpointed(spark, sf_dir)

    def table(outs):
        rows = []
        for o in outs:
            rows += [
                (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
                for r in o.collect()
            ]
        return sorted(rows)

    assert table(lazy_outs) == table(ck_outs)
    seg = lambda cur: sorted(  # noqa: E731
        (r.w, r.freq, tuple(r.seq)) for r in cur.collect()
    )
    assert seg(lazy_cur) == seg(ck_cur)
