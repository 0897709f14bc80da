"""Deterministic synthetic transcript corpus with labeled duplicate pairs.

Plays the role the reference's (absent) test corpus should have played
(reference ships 0 lines of tests — /root/reference/tests/test_resolver.py).
Seeded (default 42), pure numpy — no external data. Produces:

  * transcripts(conv_id, turn_idx:int32, role, text, tool, ts) — rows
    emitted SHUFFLED so every consumer must prove stable
    (conv_id, turn_idx) ordering (FIXTURES.md F1);
  * labeled pairs (conv_id_a, conv_id_b, is_match, perturbation) —
    exhaustive within each duplicate family plus hard negatives
    (FIXTURES.md F2).

Duplicate variants are produced by perturbation kinds: exact, typo,
paraphrase, turn_reorder, truncate, role_noise. Negatives come in two
grades: `hard_negative` (distinct conversations sharing topic
vocabulary) and `hard_negative_shared_block` (a sibling conversation
with an IDENTICAL first turn — same rare anchor token, same canonical
opening — so the pair is guaranteed to share a blocking key and
precision must be earned downstream of the blocker).
"""

from __future__ import annotations

import datetime as _dt
import itertools

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "search", "browser", "calculator", "code_exec", "file_read"]

# small deterministic vocabulary; topic words give conversations within a
# family shared distinctive tokens, filler is shared across everyone
# (that makes hard negatives genuinely hard).
_TOPICS = [
    "billing invoice refund payment subscription charge credit proration",
    "deploy kubernetes rollout container registry helm replica ingress",
    "password login authentication token session expiry lockout reset",
    "shipping package tracking courier customs delivery warehouse label",
    "database migration schema index replica latency vacuum partition",
    "flight booking itinerary layover baggage upgrade cancellation seat",
    "insurance claim policy deductible adjuster premium coverage appraisal",
    "laptop battery thermal fan firmware bios display hinge keyboard",
    "tax filing deduction bracket withholding estimate penalty extension",
    "garden irrigation compost seedling pruning fertilizer mulch trellis",
]
# corpus_distributed's codegen word selector indexes every topic's word
# array modulo len(_TOPICS[0].split()); a topic with FEWER words than
# the first would send element_at out of range (NULL words, or an error
# under ANSI mode). Topics with MORE words are safe (their surplus is
# simply never selected — topic 8 has 9 words today and the generated
# bytes must stay identical across rounds for ladder comparability, so
# the modulus stays pinned to topic 0). Enforce at module load so an
# edited topic fails loudly, not in a 9M-turn run.
assert min(len(t.split()) for t in _TOPICS) >= len(_TOPICS[0].split()), (
    "every _TOPICS entry needs at least as many words as _TOPICS[0] "
    "(corpus_distributed indexes modulo the first topic's word count)"
)

_FILLER = (
    "please can you help me with the issue i am seeing when trying to "
    "get this working thanks for the detail let me check that now okay "
    "it looks like we should first confirm and then proceed with next step"
).split()

_SYNONYMS = {
    "please": "kindly", "help": "assist", "issue": "problem",
    "check": "verify", "confirm": "validate", "proceed": "continue",
    "working": "functioning", "detail": "information", "okay": "alright",
    "first": "initially", "now": "currently", "thanks": "thank",
}

PERTURBATIONS = ["exact", "typo", "paraphrase", "turn_reorder", "truncate", "role_noise"]

# unicode-messy variants exercised on a slice of base turns (NFKC cases)
_UNICODE_MESS = [
    ("a", "ａ"),       # fullwidth a
    (" ", " "),       # nbsp
    ("'", "’"),       # smart quote
    ("", "​"),        # zero-width space injected
]


def _typo(word: str, rng: np.random.Generator) -> str:
    if len(word) < 4:
        return word
    i = int(rng.integers(1, len(word) - 1))
    op = int(rng.integers(0, 3))
    if op == 0:  # swap
        return word[: i - 1] + word[i] + word[i - 1] + word[i + 1:]
    if op == 1:  # drop
        return word[:i] + word[i + 1:]
    return word[:i] + word[i] + word[i:]  # double


def _base_turns(base_id: int, rng: np.random.Generator) -> list[tuple[str, str, str]]:
    """Return [(role, text, tool)] for one base conversation."""
    topic = _TOPICS[base_id % len(_TOPICS)].split()
    n_turns = int(rng.integers(3, 12))
    turns = []
    for t in range(n_turns):
        role = ROLES[t % 2] if rng.random() > 0.1 else str(rng.choice(ROLES))
        n_words = int(rng.integers(6, 18))
        words = []
        for _ in range(n_words):
            if rng.random() < 0.45:
                words.append(str(rng.choice(topic)))
            else:
                words.append(str(rng.choice(_FILLER)))
        # anchor tokens: rare family-specific identifiers that survive
        # perturbation — like the reference's entity names
        if t == 0:
            words.insert(0, f"case{base_id:05d}")
        text = " ".join(words)
        if rng.random() < 0.15:  # unicode mess on some base turns
            src, dst = _UNICODE_MESS[int(rng.integers(0, len(_UNICODE_MESS)))]
            text = text.replace(src, dst, 1) if src else dst.join([text[:10], text[10:]])
        tool = str(rng.choice(TOOLS)) if role in ("assistant", "tool") else ""
        turns.append((role, text, tool))
    return turns


def _perturb(
    turns: list[tuple[str, str, str]], kind: str, rng: np.random.Generator
) -> list[tuple[str, str, str]]:
    out = [list(t) for t in turns]
    if kind == "exact":
        pass
    elif kind == "typo":
        for t in out:
            words = t[1].split()
            for i in range(len(words)):
                if rng.random() < 0.06 and not words[i].startswith("case"):
                    words[i] = _typo(words[i], rng)
            t[1] = " ".join(words)
    elif kind == "paraphrase":
        for t in out:
            words = t[1].split()
            for i, w in enumerate(words):
                if w in _SYNONYMS and rng.random() < 0.7:
                    words[i] = _SYNONYMS[w]
            t[1] = " ".join(words)
    elif kind == "turn_reorder":
        if len(out) >= 4:
            i = int(rng.integers(1, len(out) - 2))
            out[i], out[i + 1] = out[i + 1], out[i]
    elif kind == "truncate":
        keep = max(2, int(len(out) * 0.8))
        out = out[:keep]
    elif kind == "role_noise":
        for t in out:
            if rng.random() < 0.3:
                t[0] = str(rng.choice(ROLES))
    else:
        raise ValueError(kind)
    return [tuple(t) for t in out]


def generate_corpus(
    n_base: int = 200, seed: int = 42, dup_min: int = 1, dup_max: int = 4
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts_pdf, labeled_pairs_pdf), fully deterministic."""
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    families: dict[int, list[str]] = {}
    perturb_of: dict[str, str] = {}
    t0 = _dt.datetime(2026, 1, 1)

    sibling_of: dict[int, str] = {}
    for b in range(n_base):
        base_turns = _base_turns(b, rng)
        variants = [("exact", base_turns)]
        n_dup = int(rng.integers(dup_min, dup_max + 1))
        for d in range(n_dup):
            kind = PERTURBATIONS[int(rng.integers(1, len(PERTURBATIONS)))]
            variants.append((kind, _perturb(base_turns, kind, rng)))
        conv_ids = []
        for v, (kind, turns) in enumerate(variants):
            conv_id = f"conv_{b:05d}_{v}"
            conv_ids.append(conv_id)
            perturb_of[conv_id] = kind
            start = t0 + _dt.timedelta(minutes=int(rng.integers(0, 500_000)))
            for idx, (role, text, tool) in enumerate(turns):
                ts = start + _dt.timedelta(seconds=30 * idx)
                rows.append((conv_id, np.int32(idx), role, text, tool, ts))
        families[b] = conv_ids

        # shared-BLOCK hard negatives: every 3rd family gets a sibling
        # conversation whose FIRST TURN IS IDENTICAL to the family's
        # (same rare `caseNNNNN` anchor -> same rare-token blocking
        # key, same canonical opening -> same string-merge prefix key)
        # but whose remaining turns are an independently generated
        # conversation on the same topic. These force precision to be
        # EARNED at the blocking key — the pipeline blocks these pairs
        # together and must still refuse to cluster them (the north
        # rule scores F1 at shared blocking keys).
        if b % 3 == 0:
            sib_id = f"conv_{b:05d}_s"
            sib_turns = [base_turns[0]] + _base_turns(b, rng)[1:]
            sibling_of[b] = sib_id
            perturb_of[sib_id] = "shared_block_sibling"
            start = t0 + _dt.timedelta(minutes=int(rng.integers(0, 500_000)))
            for idx, (role, text, tool) in enumerate(sib_turns):
                ts = start + _dt.timedelta(seconds=30 * idx)
                rows.append((sib_id, np.int32(idx), role, text, tool, ts))

    transcripts = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    # shuffled emission: consumers must sort by (conv_id, turn_idx)
    transcripts = transcripts.sample(frac=1.0, random_state=seed).reset_index(drop=True)

    # labeled pairs: exhaustive positives within each family
    pair_rows = []
    for b, ids in families.items():
        for a, c in itertools.combinations(sorted(ids), 2):
            pair_rows.append((a, c, True, perturb_of[c]))
    # hard negatives: same-topic different-base conversations (shared vocab)
    bases = sorted(families)
    for b in bases:
        other = b + len(_TOPICS)  # same topic index
        if other in families:
            a = families[b][0]
            c = families[other][0]
            lo, hi = (a, c) if a < c else (c, a)
            pair_rows.append((lo, hi, False, "hard_negative"))
    # shared-block hard negatives: every family member vs its sibling —
    # these pairs PROVABLY share a blocking key (identical first turn,
    # same rare anchor token), so any FP here is a precision miss the
    # blocker could not have hidden
    for b, sib_id in sibling_of.items():
        for a in families[b]:
            lo, hi = (a, sib_id) if a < sib_id else (sib_id, a)
            pair_rows.append((lo, hi, False, "hard_negative_shared_block"))
    labeled = pd.DataFrame(
        pair_rows, columns=["conv_id_a", "conv_id_b", "is_match", "perturbation"]
    )
    return transcripts, labeled


def corpus_spark(spark, n_base: int = 200, seed: int = 42):
    """(transcripts_df, labeled_pairs_df) as Spark DataFrames."""
    tp, lp = generate_corpus(n_base=n_base, seed=seed)
    tdf = spark.createDataFrame(tp)
    ldf = spark.createDataFrame(lp)
    return tdf, ldf


# ---------------------------------------------------------------------------
# Distributed corpus: pure-codegen generation at arbitrary scale
# ---------------------------------------------------------------------------

def corpus_distributed(
    spark,
    n_families: int,
    members: int = 8,
    seed: int = 42,
    partitions: int | None = None,
    viral_families: int = 0,
    viral_members: int = 0,
):
    """Transcript corpus generated ON THE EXECUTORS with nothing but
    codegen expressions — no driver-side Python rows, so it scales to
    any corpus size (spark.range -> explode members -> explode turns;
    every token, role, tool, timestamp and perturbation is derived from
    xxhash64 of the coordinates, so the corpus is byte-deterministic at
    every partitioning).

    Shape: `n_families` duplicate families of exactly `members`
    conversations each. Unlike `inject_duplicates` (which multiplies
    FAMILY SIZE, making candidate pairs quadratic in the multiplier),
    growing `n_families` grows total work LINEARLY — the shape of a real
    corpus growing toward 10^12 turns. Ground truth is recoverable from
    conv_id (`f<fam>_m<member>`), so pairwise P/R is computable
    distributed at any scale, no materialized pair labels needed.

    Member 0 is the base conversation; each member >0 carries ONE
    hash-derived perturbation kind (exclusive, like `_perturb`): either
    typos (~6% of words, the `_perturb` rate; the anchor is never touched) or —
    for conversations long enough that the relative loss stays near the
    Python corpus' 80%-keep truncate — the loss of the final turn.
    Stacking both was measured to unlink the member (P=1.0, R=0.97 at
    100 families); exclusive kinds resolve at F1=1.0.

    `viral_families`/`viral_members`: the first `viral_families`
    families get `viral_members` members each instead of `members` —
    the viral-template shape of a real 100 TB transcript corpus (one
    shared template perturbed 10^5-10^6 times producing a single giant
    near-duplicate component). Generation stays byte-deterministic:
    every value derives from (fam, m, turn_idx) hashes, and the
    member explode is re-spread across partitions so one 10^5-member
    family does not serialize generation onto one task.
    """
    from pyspark.sql import functions as F

    parts = partitions or spark.sparkContext.defaultParallelism

    topics = F.array(*[F.array(*[F.lit(w) for w in t.split()]) for t in _TOPICS])
    filler = F.array(*[F.lit(w) for w in _FILLER])
    tools = F.array(*[F.lit(t) for t in TOOLS[1:]])

    def h(*cols):
        return F.xxhash64(*cols, F.lit(seed))

    fam = spark.range(0, n_families, 1, parts).withColumnRenamed("id", "fam")
    fam = fam.withColumn("n_turns", (F.lit(4) + F.pmod(h("fam", F.lit("nt")), F.lit(8))).cast("int"))

    if viral_families > 0 and viral_members > 0:
        n_members = F.when(
            F.col("fam") < viral_families, F.lit(viral_members)
        ).otherwise(F.lit(members))
    else:
        n_members = F.lit(members)

    df = (
        fam.select("fam", "n_turns", F.explode(F.sequence(F.lit(0), n_members - 1)).alias("m"))
        .withColumn(
            "truncated",
            (F.col("m") > 0)
            & (F.col("n_turns") >= 6)
            & (F.pmod(h("fam", "m", F.lit("tr")), F.lit(100)) < 20),
        )
        .select(
            "fam", "m", "truncated",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("n_turns") - F.when(F.col("truncated"), 2).otherwise(1),
                )
            ).alias("turn_idx"),
        )
    )
    if viral_families > 0 and viral_members > 0:
        # one viral family's members would otherwise all be generated by
        # the task holding its fam row — spread by (fam, m) so the giant
        # family's generation parallelizes (values are coordinate-hashed,
        # so the corpus stays byte-identical under any partitioning)
        df = df.repartition(parts, "fam", "m")

    topic_words = F.element_at(topics, (F.pmod(F.col("fam"), F.lit(len(_TOPICS))) + 1).cast("int"))
    n_words = F.lit(6) + F.pmod(h("fam", "turn_idx", F.lit("nw")), F.lit(12))

    # Real corpora grow their VOCABULARY as they grow (new names, ids,
    # product words), so a token's document frequency is roughly
    # scale-invariant. A fixed vocabulary instead makes every
    # mid-frequency token's df double when the corpus doubles — a
    # pathology no real growing corpus has (it made the centroid-merge
    # pass superlinear on early ladder runs). The `kw<i>` pool scales
    # with n_families to keep the df distribution constant across
    # ladder points: ~25% of words, pool of n_families/20 types
    # -> df ~ 60*members occurrences per type at every corpus size.
    kw_pool = max(50, n_families // 20)

    def base_word(s):
        hw = h(F.col("fam"), F.col("turn_idx"), s, F.lit("tw"))
        sel = F.pmod(hw, F.lit(100))
        return (
            F.when(
                sel < 45,
                F.element_at(
                    topic_words,
                    (F.pmod(hw, F.lit(len(_TOPICS[0].split()))) + 1).cast("int"),
                ),
            )
            .when(
                sel < 70,
                F.format_string("kw%d", F.pmod(hw, F.lit(kw_pool))),
            )
            .otherwise(
                F.element_at(filler, (F.pmod(hw, F.lit(len(_FILLER))) + 1).cast("int"))
            )
        )

    def member_word(s):
        # hash-derived typo for members > 0: ~10% of words get one of
        # {double-last-char, drop-last-char, append 'x'} — never the anchor
        w = base_word(s)
        ht = h(F.col("fam"), F.col("m"), F.col("turn_idx"), s, F.lit("ty"))
        do = (F.col("m") > 0) & ~F.col("truncated") & (F.pmod(ht, F.lit(100)) < 6)
        op = F.pmod(ht, F.lit(3))
        typo = (
            F.when(op == 0, F.concat(w, F.substring(w, -1, 1)))   # double last
            .when(op == 1, F.substring(w, 1, F.greatest(F.length(w) - 1, F.lit(1))))  # drop last
            .otherwise(F.concat(w, F.lit("x")))                   # append x
        )
        return F.when(do, typo).otherwise(w)

    words = F.transform(
        F.sequence(F.lit(0), (n_words - 1).cast("int")), lambda s: member_word(s)
    )
    anchor = F.format_string("case%07d", F.col("fam"))
    text = F.when(
        F.col("turn_idx") == 0,
        F.concat(anchor, F.lit(" "), F.array_join(words, " ")),
    ).otherwise(F.array_join(words, " "))

    role = F.element_at(F.array(F.lit("user"), F.lit("assistant")), (F.pmod("turn_idx", F.lit(2)) + 1).cast("int"))
    tool = F.when(
        (role == "assistant") & (F.pmod(h("fam", "turn_idx", F.lit("tl")), F.lit(6)) == 0),
        F.element_at(tools, (F.pmod(h("fam", "turn_idx", F.lit("tc")), F.lit(len(TOOLS) - 1)) + 1).cast("int")),
    ).otherwise(F.lit(""))
    ts = F.timestamp_seconds(
        F.lit(1_767_225_600)
        + F.pmod(h("fam", F.lit("t0")), F.lit(10_000_000))
        + F.col("m") * 3600
        + F.col("turn_idx") * 30
    )

    return df.select(
        F.format_string("f%07d_m%d", "fam", "m").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def pairwise_prf(resolved, conv_col: str = "conv_id", cluster_col: str = "cluster"):
    """Distributed pairwise precision/recall/F1 against the family
    ground truth encoded in corpus_distributed conv_ids (`f<fam>_m*`).
    Contingency counting only — no pair materialization, so it runs at
    any scale: TP = sum over (family, cluster) cells of C(n,2),
    TP+FP = sum over clusters, TP+FN = sum over families."""
    from pyspark.sql import functions as F

    cells = resolved.select(
        F.split(conv_col, "_").getItem(0).alias("fam"), F.col(cluster_col).alias("cl")
    )

    def pairs(df, *keys):
        return (
            df.groupBy(*keys)
            .count()
            .select(F.sum(F.expr("count * (count - 1) / 2")).alias("p"))
            .collect()[0]["p"]
            or 0.0
        )

    tp = pairs(cells, "fam", "cl")
    tp_fp = pairs(cells, "cl")
    tp_fn = pairs(cells, "fam")
    p = tp / tp_fp if tp_fp else 1.0
    r = tp / tp_fn if tp_fn else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": tp_fp - tp, "fn": tp_fn - tp}
