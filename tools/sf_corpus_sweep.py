"""Large-scale correctness leg (round-3 judge item #5): run every
corpus-scaling query (the ones whose oracle reads the generated
tokenized corpus, auto-detected — no TPC-H tables involved) at an
arbitrary corpus tag (default sf1 = 5M docs / ~745M tokens) and compare
engine vs DuckDB oracle EXACTLY without ever materializing either side
in pandas:

* the engine result streams to parquet via Ray's write_parquet;
* DuckDB evaluates ``(engine EXCEPT ALL oracle) UNION ALL (oracle
  EXCEPT ALL engine)`` — an order-insensitive, duplicate-exact,
  spill-capable multiset comparison (the same contract as the driver's
  value-hash check, at a scale where a pandas sort would not fit).

Per-query wall-clock budget: a query whose ORACLE cannot finish inside
``--timeout`` seconds is recorded ``ORACLE_TIMEOUT`` (the engine side
still ran) — a documented exclusion, not a silent skip. Each oracle
runs in its own subprocess so a DuckDB OOM/segfault cannot kill the
sweep. Queries whose SQL oracle is inherently unspillable (giant-list
rebuilds) get a STREAM verifier instead: a constant-memory positional
hash-sum equality over the flattened token streams (see
``STREAM_VERIFIERS``).

Round-5 HASH-SLICE AUDIT: the five remaining full-re-derivation
exclusions (span_dedupe / span_dedupe_exchange / span_dedupe_incr /
ngram_novelty / ngram_novelty_incr — their global gram models are
corpus-sized) are sample-audited through ``gram_slice_audit_corpus``:
the engine's real packed bucket exchange restricted to the
content-defined gram slice ``sum(tokens) % 256 == 17`` (a predicate SQL
computes identically — both models are self-contained on a content
slice), per-doc distinct/novel/duplicate counts compared exactly via
the standard EXCEPT ALL path. Running THIS query at sf1 verifies the
shared extraction + hash + exchange + counting machinery of all five
excluded queries on ~1/256 of the sf1 gram volume; see
functions/tokens.py gram_slice_audit and BASELINE.md round 5.

Usage: python tools/sf_corpus_sweep.py [tag] [--timeout N] [query ...]
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time
import warnings

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    warnings.filterwarnings("ignore")
    args = [a for a in sys.argv[1:]]
    timeout = 900.0
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i : i + 2]
    tag = args[0] if args else "sf1"
    only = set(args[1:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from vector_ray import datagen
    from vector_ray._compat import register_package_for_workers
    from vector_ray.entry_queries import QUERIES, oracle_sql

    register_package_for_workers()
    datagen.ensure_corpus(tag)
    oracles = oracle_sql()
    seqs_at_oracle_tag = datagen.sequences_dir("sf0.01")

    corpus_queries = []
    for name, s in oracles.items():
        if seqs_at_oracle_tag not in s:
            continue
        if any(re.search(rf"\b{t}\b", s) for t in TABLES):
            continue  # mixed query — needs the driver tables, skip
        corpus_queries.append(name)
    if only:
        corpus_queries = [q for q in corpus_queries if q in only]
    print(f"{len(corpus_queries)} corpus-scaling queries at {tag}")

    # Special-case verifier for exact concat-and-chunk packing: its SQL
    # oracle re-builds 2048-token LIST chunks via a global aggregation,
    # which DuckDB cannot spill (OOM at sf1). Instead verify the
    # DEFINITION directly and streamingly: the flattened (global
    # position, token) stream of the engine's chunks must equal the
    # corpus's doc_id-ordered token stream — compared by COUNT + SUM of
    # a per-(pos, tok) hash, constant-memory aggregates over both sides.
    def pack_stream_sql(eng_glob: str, seq_glob: str) -> str:
        return (
            "WITH e AS (SELECT chunk_id, unnest(tokens) AS tok, "
            f"  generate_subscripts(tokens, 1) AS i FROM read_parquet('{eng_glob}')), "
            "epos AS (SELECT chunk_id * 2048 + i - 1 AS pos, tok FROM e), "
            f"c AS (SELECT doc_id, tokens FROM read_parquet('{seq_glob}')), "
            "cw AS (SELECT tokens, COALESCE(SUM(len(tokens)) OVER ("
            "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "  PRECEDING), 0) AS base FROM c), "
            "cpos AS (SELECT base + generate_subscripts(tokens, 1) - 1 AS pos, "
            "  unnest(tokens) AS tok FROM cw), "
            "a AS (SELECT COUNT(*) AS n, SUM(hash(pos, tok)::HUGEINT) AS h "
            "  FROM epos), "
            "b AS (SELECT COUNT(*) AS n, SUM(hash(pos, tok)::HUGEINT) AS h "
            "  FROM cpos) "
            "SELECT a.n, b.n, CASE WHEN a.n = b.n AND a.h = b.h "
            "THEN 0 ELSE 1 END FROM a, b"
        )

    def pack_eos_stream_sql(eng_glob: str, seq_glob: str) -> str:
        # same positional check, but the reference stream is "each doc's
        # tokens followed by one EOS separator" (append_eos composed
        # into the pack) — the EOS id mirrors functions/tokens.py
        from vector_ray.functions.tokens import EOS_TOKEN

        return (
            "WITH e AS (SELECT chunk_id, unnest(tokens) AS tok, "
            f"  generate_subscripts(tokens, 1) AS i FROM read_parquet('{eng_glob}')), "
            "epos AS (SELECT chunk_id * 2048 + i - 1 AS pos, tok FROM e), "
            f"c AS (SELECT doc_id, tokens FROM read_parquet('{seq_glob}')), "
            "cw AS (SELECT tokens, COALESCE(SUM(len(tokens) + 1) OVER ("
            "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "  PRECEDING), 0) AS base FROM c), "
            "cpos AS (SELECT base + generate_subscripts(tokens, 1) - 1 AS pos, "
            "  unnest(tokens) AS tok FROM cw "
            f"  UNION ALL SELECT base + len(tokens), {EOS_TOKEN} FROM cw), "
            "a AS (SELECT COUNT(*) AS n, SUM(hash(pos, tok)::HUGEINT) AS h "
            "  FROM epos), "
            "b AS (SELECT COUNT(*) AS n, SUM(hash(pos, tok)::HUGEINT) AS h "
            "  FROM cpos) "
            "SELECT a.n, b.n, CASE WHEN a.n = b.n AND a.h = b.h "
            "THEN 0 ELSE 1 END FROM a, b"
        )

    # Round-4 verifiers closing oracle-capacity exclusions:
    #
    # The LAG-window bigram oracles (kn_bigram / bigram_lm /
    # ppl_windows) OOM'd at sf1 because `LAG() OVER (PARTITION BY
    # doc_id ORDER BY i)` over 745M positions is a corpus-sized sort.
    # DuckDB zips PARALLEL UNNESTs positionally, so adjacent-token
    # pairs come straight off the list slices with NO window and NO
    # sort: unnest(tokens[1:L-1]) || unnest(tokens[2:L]). The folded
    # (%256) model tables stay <=65k groups, per-doc score aggregation
    # is a 5M-group hash agg, and the final EXCEPT ALL is over the 5M
    # output rows — every stage streams or fits.
    def _pairs_cte(seq_glob: str, with_ord: bool = False) -> str:
        ord_sel = (
            ", generate_subscripts(tokens[2:len(tokens)], 1) + 1 AS i "
            if with_ord
            else " "
        )
        return (
            "prs AS (SELECT doc_id, "
            "unnest(tokens[1:len(tokens)-1]) % 256 AS pv, "
            "unnest(tokens[2:len(tokens)]) % 256 AS cu"
            + ord_sel
            + f"FROM read_parquet('{seq_glob}') WHERE len(tokens) > 1)"
        )

    def _triple(orc_body: str, eng_glob: str, cols: str) -> str:
        return (
            f"SELECT (SELECT COUNT(*) FROM eng), (SELECT COUNT(*) FROM orc), "
            "(SELECT COUNT(*) FROM ((SELECT * FROM eng EXCEPT ALL SELECT * "
            "FROM orc) UNION ALL (SELECT * FROM orc EXCEPT ALL SELECT * "
            "FROM eng)))"
        )

    def kn_bigram_stream_sql(eng_glob: str, seq_glob: str) -> str:
        return (
            "WITH " + _pairs_cte(seq_glob) + ", "
            "c2 AS (SELECT pv, cu, CAST(COUNT(*) AS DOUBLE) AS n FROM prs "
            "GROUP BY pv, cu), "
            "c1 AS (SELECT pv, SUM(n) AS nn, CAST(COUNT(*) AS DOUBLE) AS nf "
            "FROM c2 GROUP BY pv), "
            "r AS (SELECT cu, CAST(COUNT(*) AS DOUBLE) AS nr FROM c2 GROUP BY cu), "
            # the corpus-total scalar rides along r as a window sum over
            # its 256 rows: a `CROSS JOIN (SELECT COUNT(*) FROM c2)`
            # here makes DuckDB's join-order planner materialize a
            # corpus-sized intermediate (observed: unbounded spill at
            # sf0.01); tt = SUM(nr) is the same number, join-free
            "r2 AS (SELECT cu, nr, SUM(nr) OVER () AS tt FROM r), "
            "sc AS (SELECT p.doc_id, ln((c2.n - 0.75) / c1.nn + 0.75 * c1.nf "
            "/ c1.nn * (r2.nr / r2.tt)) AS lp FROM prs p "
            "JOIN c2 ON c2.pv = p.pv AND c2.cu = p.cu "
            "JOIN c1 ON c1.pv = p.pv JOIN r2 ON r2.cu = p.cu), "
            "orc AS (SELECT doc_id, ROUND(ROUND(-AVG(lp), 9), 4) AS nll_kn "
            "FROM sc GROUP BY doc_id), "
            f"eng AS (SELECT doc_id, nll_kn FROM read_parquet('{eng_glob}')) "
            + _triple("", eng_glob, "")
        )

    def bigram_lm_stream_sql(eng_glob: str, seq_glob: str) -> str:
        return (
            "WITH " + _pairs_cte(seq_glob) + ", "
            "c2 AS (SELECT pv, cu, COUNT(*) AS n FROM prs GROUP BY pv, cu), "
            "c1 AS (SELECT pv, SUM(n) AS nn FROM c2 GROUP BY pv), "
            "sc AS (SELECT p.doc_id, ln(c2.n + 1.0) - ln(c1.nn + 256.0) AS lp "
            "FROM prs p JOIN c2 ON c2.pv = p.pv AND c2.cu = p.cu "
            "JOIN c1 ON c1.pv = p.pv), "
            "orc AS (SELECT doc_id, ROUND(ROUND(-AVG(lp), 9), 4) AS nll "
            "FROM sc GROUP BY doc_id), "
            f"eng AS (SELECT doc_id, nll FROM read_parquet('{eng_glob}')) "
            + _triple("", eng_glob, "")
        )

    def ppl_windows_stream_sql(eng_glob: str, seq_glob: str) -> str:
        return (
            "WITH " + _pairs_cte(seq_glob, with_ord=True) + ", "
            "c2 AS (SELECT pv, cu, COUNT(*) AS n FROM prs GROUP BY pv, cu), "
            "c1 AS (SELECT pv, SUM(n) AS nn FROM c2 GROUP BY pv), "
            "sc AS (SELECT p.doc_id, (p.i - 2) // 32 AS win, "
            "ln(c2.n + 1.0) - ln(c1.nn + 256.0) AS lp FROM prs p "
            "JOIN c2 ON c2.pv = p.pv AND c2.cu = p.cu "
            "JOIN c1 ON c1.pv = p.pv), "
            "w AS (SELECT doc_id, win, CAST(COUNT(*) AS BIGINT) AS n_trans, "
            "ROUND(ROUND(-AVG(lp), 9), 4) AS nll FROM sc GROUP BY doc_id, win), "
            "orc AS (SELECT doc_id, win, n_trans, nll, nll > 5.6 AS flagged "
            "FROM w), "
            "eng AS (SELECT doc_id, win, n_trans, nll, flagged "
            f"FROM read_parquet('{eng_glob}')), "
            # per-window AVG over ≤32 doubles: engine and oracle sum in
            # different orders, and a value landing exactly on a 4th-
            # decimal rounding boundary after the 9-digit round can flip
            # its last digit (observed: 28 of 25.5M windows at sf1 —
            # strict EXCEPT ALL is run at sf0.01 where boundary hits
            # are ~zero). Verify by KEY JOIN instead: counts must match
            # exactly, nll within ONE final-digit step, and a flag
            # mismatch only where the nll interval straddles the 5.6
            # threshold.
            "j AS (SELECT e.n_trans AS et, o.n_trans AS ot, "
            "e.nll AS en, o.nll AS onn, e.flagged AS ef, o.flagged AS ofl "
            "FROM eng e FULL JOIN orc o USING (doc_id, win)) "
            "SELECT (SELECT COUNT(*) FROM eng), (SELECT COUNT(*) FROM orc), "
            "(SELECT COUNT(*) FROM j WHERE et IS NULL OR ot IS NULL "
            "OR et != ot OR ABS(en - onn) > 0.00010001 "
            "OR (ef != ofl AND NOT (LEAST(en, onn) <= 5.6 "
            "AND GREATEST(en, onn) >= 5.6)))"
        )

    # vocab_remap OOM'd on the output-side `list(... ORDER BY ord)`
    # rebuild (unspillable giant-list aggregation). The remap MAP is
    # tiny (<= vocab rows); verify the DEFINITION positionally instead:
    # hash-sum of (doc_id, position, remapped id) over the oracle's
    # mapped stream must equal the same sum over the engine's flattened
    # output lists — constant-memory aggregates both sides (the
    # pack_sequences verifier pattern).
    def vocab_remap_stream_sql(eng_glob: str, seq_glob: str) -> str:
        return (
            "WITH cnt AS (SELECT tok, COUNT(*) n FROM (SELECT unnest(tokens) "
            f"tok FROM read_parquet('{seq_glob}')) GROUP BY 1), "
            "rk AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) r "
            "FROM cnt), "
            "mp AS (SELECT tok, CAST(r AS BIGINT) AS new FROM rk), "
            "tk AS (SELECT doc_id, unnest(tokens) tok, "
            f"generate_subscripts(tokens, 1) ord FROM read_parquet('{seq_glob}')), "
            "orcpos AS (SELECT doc_id, ord, COALESCE(mp.new, 0) AS new "
            "FROM tk LEFT JOIN mp USING (tok)), "
            "engpos AS (SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS new, "
            f"generate_subscripts(tokens, 1) AS ord FROM read_parquet('{eng_glob}')), "
            "a AS (SELECT COUNT(*) AS n, SUM(hash(doc_id, ord, new)::HUGEINT) "
            "AS h FROM engpos), "
            "b AS (SELECT COUNT(*) AS n, SUM(hash(doc_id, ord, new)::HUGEINT) "
            "AS h FROM orcpos) "
            "SELECT a.n, b.n, CASE WHEN a.n = b.n AND a.h = b.h THEN 0 "
            "ELSE 1 END FROM a, b"
        )

    STREAM_VERIFIERS = {
        "pack_sequences_corpus": pack_stream_sql,
        "pack_eos_corpus": pack_eos_stream_sql,
        "kn_bigram_corpus": kn_bigram_stream_sql,
        "bigram_lm_corpus": bigram_lm_stream_sql,
        "ppl_windows_corpus": ppl_windows_stream_sql,
        "vocab_remap_corpus": vocab_remap_stream_sql,
    }

    # Per-doc SHARDED oracles (round-4): these queries' oracles are pure
    # per-doc functions (each output row depends only on its own doc),
    # but the one-shot SQL needs a corpus-sized intermediate — 650M
    # (doc, token) groups for entropy/repetition, a 745M-row window
    # prefix-sum for loss_mask, per-position gram indexing for winnow /
    # span_corrupt. Decompose by INPUT FILE instead: run the identical
    # oracle SQL over each shard group, compare against the engine
    # output restricted to that group's doc_ids (a semi-join against
    # <= docs/group ids), and sum diffs. Each subprocess's working set
    # is 1/groups of the corpus; the union of shards covers every doc
    # exactly once, and engine rows are counted across shards so an
    # engine row with an id in NO shard would surface as a count
    # mismatch.
    SHARDED_PER_DOC = {
        "token_entropy_corpus": "doc_id",
        "repetition_corpus": "doc_id",
        "loss_mask_corpus": "doc_id",
        "winnow_corpus": "doc_id",
        "span_corrupt_corpus": "doc_id",
        "contamination_corpus": "doc_id",
    }

    # contamination's blocklist (distinct 8-grams of every-97th doc) is
    # GLOBAL — the default shard rewrite would shard the blocklist too.
    # Custom builder: blocklist CTEs read the FULL corpus (1/97 of the
    # docs — cheap), only the probe side + final projection shard.
    def contamination_shard_sql(flist: str, full_glob: str) -> str:
        return (
            "WITH seqall AS (SELECT doc_id, tokens, n_tok "
            f"FROM read_parquet('{full_glob}')), "
            "ev AS (SELECT tokens, n_tok FROM seqall "
            "WHERE CAST(substr(doc_id, 5) AS BIGINT) % 97 = 0), "
            "evp AS (SELECT tokens, unnest(generate_series(1, "
            "CAST(n_tok AS BIGINT) - 7)) AS i FROM ev), "
            "evg AS (SELECT DISTINCT tokens[i:i+7] AS gram FROM evp), "
            f"seq AS (SELECT doc_id, tokens, n_tok FROM read_parquet({flist})), "
            "dp AS (SELECT doc_id, tokens, unnest(generate_series(1, "
            "CAST(n_tok AS BIGINT) - 7)) AS i FROM seq), "
            "dg AS (SELECT doc_id, tokens[i:i+7] AS gram FROM dp), "
            "hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM dg JOIN evg USING (gram) GROUP BY 1) "
            "SELECT s.doc_id, COALESCE(h.n, 0) AS n_gram_hits, "
            "COALESCE(h.n, 0) > 0 AS contaminated "
            "FROM seq s LEFT JOIN hits h USING (doc_id)"
        )

    SHARDED_BUILDERS = {"contamination_corpus": contamination_shard_sql}

    # span_corrupt's oracle rebuilds per-doc BIGINT[] lists via
    # list(ORDER BY) + flatten — DuckDB's list-aggregation state is
    # unspillable and measured ~30 GB for a 1/16 corpus shard, so this
    # query shards 4× finer (64 groups ≈ 7-8 GB aggregation state each)
    SHARD_GROUPS = {"span_corrupt_corpus": 64}

    import base64 as _b64
    import glob as _glob
    import json as _json
    import subprocess as _sp

    _SHARD_RUNNER = (
        "import base64, json, os, duckdb, sys\n"
        "sql = base64.b64decode(sys.argv[1]).decode()\n"
        "eng = sys.argv[2]\n"
        "id_col = sys.argv[3]\n"
        "files = json.loads(base64.b64decode(sys.argv[4]).decode())\n"
        "import atexit, shutil\n"
        "spill = f'/tmp/duckdb_spill/{os.getpid()}'\n"
        "os.makedirs(spill, exist_ok=True)\n"
        "atexit.register(lambda: shutil.rmtree(spill, ignore_errors=True))\n"
        "con = duckdb.connect()\n"
        "con.execute(\"SET memory_limit='32GB'; SET threads=12; \"\n"
        "    f\"SET temp_directory='{spill}'; \"\n"
        "    \"SET max_temp_directory_size='60GB';\")\n"
        "con.execute(f'CREATE VIEW orc AS ({sql})')\n"
        "cols = [d[0] for d in con.execute('SELECT * FROM orc LIMIT 0').description]\n"
        "collist = ', '.join(f'\"{c}\"' for c in cols)\n"
        "flist = '[' + ', '.join(f\"'{f}'\" for f in files) + ']'\n"
        "con.execute(f\"CREATE VIEW eng AS SELECT {collist} \"\n"
        "    f\"FROM read_parquet('{eng}/*.parquet') \"\n"
        "    f'WHERE \"{id_col}\" IN (SELECT \"{id_col}\" '\n"
        "    f\"FROM read_parquet({flist}))\")\n"
        "row = con.execute('SELECT (SELECT COUNT(*) FROM eng), (SELECT COUNT(*) FROM orc), '\n"
        "    '(SELECT COUNT(*) FROM ((SELECT * FROM eng EXCEPT ALL SELECT * FROM orc) '\n"
        "    'UNION ALL (SELECT * FROM orc EXCEPT ALL SELECT * FROM eng)))').fetchone()\n"
        "print(json.dumps(list(row)))\n"
    )

    def run_sharded(name: str, eng_dir: str, shard_timeout: float):
        """Per-doc sharded oracle: identical oracle SQL per shard group
        of input files vs the engine output semi-joined to that group's
        ids. Returns (status, n_eng, n_orc, n_diff, detail)."""
        id_col = SHARDED_PER_DOC[name]
        seqdir = datagen.sequences_dir(tag)
        files = sorted(_glob.glob(f"{seqdir}/*.parquet"))
        n_groups = min(len(files), SHARD_GROUPS.get(name, 16))
        glob_lit = f"'{seqdir}/*.parquet'"
        base_sql = oracles[name].replace("/sf0.01/", f"/{tag}/")
        builder = SHARDED_BUILDERS.get(name)
        tot_e = tot_o = tot_d = 0
        for g in range(n_groups):
            grp = files[g::n_groups]
            flist = "[" + ", ".join(f"'{f}'" for f in grp) + "]"
            if builder is not None:
                sql_g = builder(flist, f"{seqdir}/*.parquet")
            else:
                sql_g = base_sql.replace(glob_lit, flist)
                if sql_g == base_sql:
                    return ("FAIL", 0, 0, 0,
                            f"shard glob {glob_lit} not found in oracle SQL")
            try:
                proc = _sp.run(
                    [sys.executable, "-c", _SHARD_RUNNER,
                     _b64.b64encode(sql_g.encode()).decode(), eng_dir,
                     id_col,
                     _b64.b64encode(_json.dumps(grp).encode()).decode()],
                    capture_output=True, text=True, timeout=shard_timeout,
                )
            except _sp.TimeoutExpired:
                return ("ORACLE_TIMEOUT", tot_e, tot_o, tot_d,
                        f"shard {g + 1}/{n_groups} exceeded {shard_timeout:.0f}s")
            if proc.returncode != 0:
                err = (proc.stderr or "").strip().splitlines()
                tail_line = err[-1] if err else f"exit {proc.returncode}"
                if "OutOfMemory" in (proc.stderr or "") or \
                        "No space left" in (proc.stderr or ""):
                    return ("ORACLE_OOM", tot_e, tot_o, tot_d,
                            f"shard {g + 1}/{n_groups}: {tail_line[:120]}")
                return ("FAIL", tot_e, tot_o, tot_d,
                        f"shard {g + 1}/{n_groups} raised {tail_line[:160]}")
            e, o, d = _json.loads(proc.stdout.strip().splitlines()[-1])
            tot_e += e
            tot_o += o
            tot_d += d
        return ("OK", tot_e, tot_o, tot_d, f"{n_groups} shards")

    def verify_token_drift(eng_dir: str, shard_timeout: float):
        """token_drift's per-(source, token) count table is tiny
        (sources × vocab ≤ ~500k rows), but the single-shot unnest of
        every token WITH its source string OOM'd at sf1. Two phases:
        per-shard partial counts (bounded result per shard), summed in
        pandas; then the oracle's exact KL tail SQL over the combined
        counts — identical arithmetic on identical values, with the
        double-round absorbing summation-order ulps."""
        import duckdb
        import pandas as pd

        seqdir = datagen.sequences_dir(tag)
        files = sorted(_glob.glob(f"{seqdir}/*.parquet"))
        n_groups = min(len(files), 16)
        acc = None
        for g in range(n_groups):
            grp = files[g::n_groups]
            flist = "[" + ", ".join(f"'{f}'" for f in grp) + "]"
            con = duckdb.connect()
            con.execute(
                "SET memory_limit='24GB'; SET threads=12; "
                "SET temp_directory='/tmp/duckdb_spill';"
            )
            df = con.execute(
                "SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM "
                f"(SELECT source, unnest(tokens) tok FROM read_parquet({flist})) "
                "GROUP BY 1, 2"
            ).df()
            con.close()
            acc = (
                df
                if acc is None
                else pd.concat([acc, df])
                .groupby(["source", "tok"], as_index=False)["c"]
                .sum()
            )
        con = duckdb.connect()
        con.register("acc", acc)
        con.execute(
            "CREATE VIEW orc AS ("
            "WITH per AS (SELECT source, tok, c FROM acc), "
            "src AS (SELECT source, SUM(c) ns FROM per GROUP BY 1), "
            "gcnt AS (SELECT tok, SUM(c) cg FROM per GROUP BY 1), "
            "tot AS (SELECT SUM(c) n FROM per) "
            "SELECT source, CAST(ns AS BIGINT) AS n_tokens, "
            "ROUND(ROUND(SUM((c/ns) * ln((c/ns) / (cg/n))), 9), 4) AS kl "
            "FROM per JOIN src USING (source) JOIN gcnt USING (tok) "
            "CROSS JOIN tot GROUP BY source, ns)"
        )
        con.execute(
            "CREATE VIEW eng AS SELECT source, n_tokens, kl "
            f"FROM read_parquet('{eng_dir}/*.parquet')"
        )
        row = con.execute(
            "SELECT (SELECT COUNT(*) FROM eng), (SELECT COUNT(*) FROM orc), "
            "(SELECT COUNT(*) FROM ((SELECT * FROM eng EXCEPT ALL SELECT * "
            "FROM orc) UNION ALL (SELECT * FROM orc EXCEPT ALL SELECT * "
            "FROM eng)))"
        ).fetchone()
        return ("OK", int(row[0]), int(row[1]), int(row[2]),
                f"{n_groups} shard partials + bounded final")

    def verify_logreg_quality(eng_dir: str, shard_timeout: float):
        """logreg_quality's OOM stage is the per-(doc, token) count
        behind the 4 per-doc features; the 3 fixed gradient steps and
        the scoring run over just 4 doubles per doc. Two phases:
        per-shard feature extraction (per-doc decomposable) COPYied to
        parquet, then the oracle's exact w1/w2/w3 + scoring SQL over
        the bounded combined feature table. Weights are ROUND(...,9)ed
        in the original precisely so summation order doesn't leak."""
        import duckdb

        seqdir = datagen.sequences_dir(tag)
        files = sorted(_glob.glob(f"{seqdir}/*.parquet"))
        n_groups = min(len(files), 16)
        tmpd = f"{out_root}/_logreg_feats"
        shutil.rmtree(tmpd, ignore_errors=True)
        os.makedirs(tmpd, exist_ok=True)
        for g in range(n_groups):
            grp = files[g::n_groups]
            flist = "[" + ", ".join(f"'{f}'" for f in grp) + "]"
            con = duckdb.connect()
            con.execute(
                "SET memory_limit='24GB'; SET threads=12; "
                "SET temp_directory='/tmp/duckdb_spill';"
            )
            con.execute(
                "COPY (WITH base AS (SELECT doc_id, source, tokens, n_tok "
                f"FROM read_parquet({flist}) WHERE n_tok > 0), "
                "tk AS (SELECT doc_id, unnest(tokens) AS tok FROM base), "
                "cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2), "
                "st AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS nty, "
                "CAST(MAX(c) AS DOUBLE) AS mx, CAST(SUM(c) AS DOUBLE) AS nt "
                "FROM cnt GROUP BY 1) "
                "SELECT b.doc_id, 1.0 AS x0, b.n_tok / 100.0 AS x1, "
                "st.nty / st.nt AS x2, st.mx / st.nt AS x3, "
                "CASE WHEN b.source IN ('wiki', 'books', 'academic') "
                "THEN 1.0 ELSE 0.0 END AS y FROM base b JOIN st USING (doc_id)) "
                f"TO '{tmpd}/part-{g}.parquet' (FORMAT PARQUET)"
            )
            con.close()
        con = duckdb.connect()
        con.execute(
            "SET memory_limit='24GB'; SET threads=12; "
            "SET temp_directory='/tmp/duckdb_spill';"
        )
        step = (
            "SELECT ROUND(MAX(w.wa) - 0.5 * SUM((1.0 / (1.0 + exp(-(w.wa*x0 "
            "+ w.wb*x1 + w.wc*x2 + w.wd*x3))) - y) * x0) / COUNT(*), 9) AS wa, "
            "ROUND(MAX(w.wb) - 0.5 * SUM((1.0 / (1.0 + exp(-(w.wa*x0 + w.wb*x1 "
            "+ w.wc*x2 + w.wd*x3))) - y) * x1) / COUNT(*), 9) AS wb, "
            "ROUND(MAX(w.wc) - 0.5 * SUM((1.0 / (1.0 + exp(-(w.wa*x0 + w.wb*x1 "
            "+ w.wc*x2 + w.wd*x3))) - y) * x2) / COUNT(*), 9) AS wc, "
            "ROUND(MAX(w.wd) - 0.5 * SUM((1.0 / (1.0 + exp(-(w.wa*x0 + w.wb*x1 "
            "+ w.wc*x2 + w.wd*x3))) - y) * x3) / COUNT(*), 9) AS wd "
            "FROM feats, {prev} w"
        )
        con.execute(
            "CREATE VIEW feats AS SELECT * FROM "
            f"read_parquet('{tmpd}/*.parquet')"
        )
        con.execute(
            "CREATE VIEW orc AS (WITH "
            "w0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc, 0.0 AS wd), "
            f"w1 AS ({step.format(prev='w0')}), "
            f"w2 AS ({step.format(prev='w1')}), "
            f"w3 AS ({step.format(prev='w2')}) "
            "SELECT f.doc_id, ROUND(ROUND(1.0 / (1.0 + exp(-(w.wa*f.x0 + "
            "w.wb*f.x1 + w.wc*f.x2 + w.wd*f.x3))), 9), 6) AS prob, "
            "CAST(f.y AS BIGINT) AS label FROM feats f, w3 w)"
        )
        con.execute(
            "CREATE VIEW eng AS SELECT doc_id, prob, label "
            f"FROM read_parquet('{eng_dir}/*.parquet')"
        )
        row = con.execute(
            "SELECT (SELECT COUNT(*) FROM eng), (SELECT COUNT(*) FROM orc), "
            "(SELECT COUNT(*) FROM ((SELECT * FROM eng EXCEPT ALL SELECT * "
            "FROM orc) UNION ALL (SELECT * FROM orc EXCEPT ALL SELECT * "
            "FROM eng)))"
        ).fetchone()
        shutil.rmtree(tmpd, ignore_errors=True)
        return ("OK", int(row[0]), int(row[1]), int(row[2]),
                f"{n_groups} feature shards + bounded 3-step training")

    PYTHON_VERIFIERS = {
        "token_drift_corpus": verify_token_drift,
        "logreg_quality_corpus": verify_logreg_quality,
    }

    sf_dir = f"/root/testdata/{tag}"  # only the basename (tag) is used
    out_root = f"/tmp/sf_sweep/{tag}"
    os.makedirs(out_root, exist_ok=True)
    failures = 0
    for name in corpus_queries:
        t0 = time.perf_counter()
        try:
            ds = QUERIES[name](sf_dir)
            out_dir = f"{out_root}/{name}"
            shutil.rmtree(out_dir, ignore_errors=True)
            import pandas as pd
            import pyarrow as pa

            if isinstance(ds, (pd.DataFrame,)):
                os.makedirs(out_dir, exist_ok=True)
                pa_tbl = pa.Table.from_pandas(ds, preserve_index=False)
                import pyarrow.parquet as pq

                pq.write_table(pa_tbl, f"{out_dir}/part-0.parquet")
            elif isinstance(ds, pa.Table):
                os.makedirs(out_dir, exist_ok=True)
                import pyarrow.parquet as pq

                pq.write_table(ds, f"{out_dir}/part-0.parquet")
            else:
                ds.write_parquet(out_dir)
        except Exception as e:
            print(f"FAIL  {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t_engine = time.perf_counter() - t0

        if name in PYTHON_VERIFIERS:
            try:
                status, n_e, n_o, n_d, detail = PYTHON_VERIFIERS[name](
                    f"{out_root}/{name}", max(120.0, timeout / 4)
                )
            except Exception as e:
                msg = f"{type(e).__name__}: {e}"
                if "OutOfMemory" in msg or "No space left" in msg:
                    print(
                        f"ORACLE_OOM  {name}: engine {t_engine:.1f}s ok, "
                        f"python verifier died ({msg[:120]}) — documented "
                        "exclusion"
                    )
                else:
                    failures += 1
                    print(f"FAIL  {name}: python verifier raised {msg[:160]}")
                shutil.rmtree(f"{out_root}/{name}", ignore_errors=True)
                continue
            t_total = time.perf_counter() - t0
            shutil.rmtree(f"{out_root}/{name}", ignore_errors=True)
            if n_e == n_o and n_d == 0:
                print(
                    f"OK    {name}: {n_e} rows exact via {detail} "
                    f"(engine {t_engine:.1f}s, total {t_total:.1f}s)"
                )
            else:
                failures += 1
                print(
                    f"FAIL  {name}: engine {n_e} rows vs oracle {n_o}, "
                    f"multiset diff {n_d} ({detail})"
                )
            continue

        if name in SHARDED_PER_DOC:
            status, n_e, n_o, n_d, detail = run_sharded(
                name, f"{out_root}/{name}", max(120.0, timeout / 4)
            )
            t_total = time.perf_counter() - t0
            shutil.rmtree(f"{out_root}/{name}", ignore_errors=True)
            if status == "OK" and n_e == n_o and n_d == 0:
                print(
                    f"OK    {name}: {n_e} rows exact across {detail} "
                    f"(engine {t_engine:.1f}s, total {t_total:.1f}s)"
                )
            elif status == "OK":
                failures += 1
                print(
                    f"FAIL  {name}: engine {n_e} rows vs oracle {n_o}, "
                    f"multiset diff {n_d} ({detail})"
                )
            elif status in ("ORACLE_TIMEOUT", "ORACLE_OOM"):
                print(
                    f"{status}  {name}: engine {t_engine:.1f}s ok, "
                    f"{detail} (documented exclusion)"
                )
            else:
                failures += 1
                print(f"FAIL  {name}: {detail}")
            continue

        stream = STREAM_VERIFIERS.get(name)
        if stream is not None:
            sql = stream(
                f"{out_root}/{name}/*.parquet",
                f"{datagen.sequences_dir(tag)}/*.parquet",
            )
            mode = "direct"
        else:
            sql = oracles[name].replace(f"/{'sf0.01'}/", f"/{tag}/")
            mode = "views"
        # the oracle runs in a SUBPROCESS: a DuckDB out-of-memory (or
        # the segfault it can leave behind) must not take down the
        # sweep — a dead oracle process is recorded as an exclusion
        import base64
        import subprocess

        payload = base64.b64encode(sql.encode()).decode()
        runner = (
            "import base64, json, os, duckdb, sys\n"
            "sql = base64.b64decode(sys.argv[1]).decode()\n"
            "eng = sys.argv[2]\n"
            "mode = sys.argv[3]\n"
            "import atexit, shutil\n"
            "spill = f'/tmp/duckdb_spill/{os.getpid()}'\n"
            "os.makedirs(spill, exist_ok=True)\n"
            "atexit.register(lambda: shutil.rmtree(spill, ignore_errors=True))\n"
            "con = duckdb.connect()\n"
            "con.execute(\"SET memory_limit='48GB'; SET threads=12; \"\n"
            "    f\"SET temp_directory='{spill}'; \"\n"
            "    \"SET max_temp_directory_size='60GB';\")\n"
            "if mode == 'direct':\n"
            "    row = con.execute(sql).fetchone()\n"
            "    print(json.dumps([int(row[0]), int(row[1]), int(row[2])]))\n"
            "    sys.exit(0)\n"
            "con.execute(f'CREATE VIEW orc AS ({sql})')\n"
            "cols = [d[0] for d in con.execute('SELECT * FROM orc LIMIT 0').description]\n"
            "collist = ', '.join(f'\"{c}\"' for c in cols)\n"
            "con.execute(f\"CREATE VIEW eng AS SELECT {collist} FROM read_parquet('{eng}/*.parquet')\")\n"
            "row = con.execute('SELECT (SELECT COUNT(*) FROM eng), (SELECT COUNT(*) FROM orc), '\n"
            "    '(SELECT COUNT(*) FROM ((SELECT * FROM eng EXCEPT ALL SELECT * FROM orc) '\n"
            "    'UNION ALL (SELECT * FROM orc EXCEPT ALL SELECT * FROM eng)))').fetchone()\n"
            "print(json.dumps(list(row)))\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", runner, payload,
                 f"{out_root}/{name}", mode],
                capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(
                f"ORACLE_TIMEOUT  {name}: engine {t_engine:.1f}s ok, "
                f"oracle exceeded {timeout:.0f}s (documented exclusion)"
            )
            continue
        t_total = time.perf_counter() - t0
        if proc.returncode != 0:
            err = (proc.stderr or "").strip().splitlines()
            tail_line = err[-1] if err else f"exit {proc.returncode}"
            # capacity exclusion needs EVIDENCE of memory/disk pressure,
            # not just a crashy exit code: a segfault (-11/139) or kill
            # (-9) counts only when stderr mentions OOM/spill anywhere
            # or the spill dir is non-empty — a genuine DuckDB crash on
            # a malformed oracle query must register as FAIL, not as a
            # capacity exclusion
            full_err = proc.stderr or ""
            mem_evidence = (
                "OutOfMemory" in full_err
                or "temp_directory" in full_err
                or "No space left" in full_err
                or any(
                    os.listdir(d)
                    for d in ("/tmp/duckdb_spill",)
                    if os.path.isdir(d)
                )
            )
            if proc.returncode in (-9, -11, 139) and not mem_evidence:
                print(
                    f"FAIL  {name}: oracle crashed (exit "
                    f"{proc.returncode}) with no OOM/spill evidence — "
                    f"{tail_line[:160]}"
                )
                failures += 1
                continue
            if mem_evidence or proc.returncode in (-9, -11, 139):
                print(
                    f"ORACLE_OOM  {name}: engine {t_engine:.1f}s ok, "
                    f"oracle died ({tail_line[:120]}) — documented exclusion"
                )
                continue
            print(f"FAIL  {name}: oracle raised {tail_line[:200]}")
            failures += 1
            continue
        import json as _json

        n_eng, n_orc, n_diff = _json.loads(proc.stdout.strip().splitlines()[-1])
        shutil.rmtree(f"{out_root}/{name}", ignore_errors=True)
        if n_eng == n_orc and n_diff == 0:
            print(
                f"OK    {name}: {n_eng} rows exact "
                f"(engine {t_engine:.1f}s, total {t_total:.1f}s)"
            )
        else:
            failures += 1
            print(
                f"FAIL  {name}: engine {n_eng} rows vs oracle {n_orc}, "
                f"multiset diff {n_diff}"
            )
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
