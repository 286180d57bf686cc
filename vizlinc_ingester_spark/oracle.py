"""DuckDB oracle SQL mirroring the Spark operator DAG.

The driver runs each ``queries()`` entry in Spark AND the matching
``oracle_sql()`` string in DuckDB over the same parquet tables, then
compares row count + schema + order-insensitive value hash. This
module builds the oracle strings *programmatically from the same
constants* the Spark operators use (md5 type buckets, variant rule,
normalization chain, Levenshtein threshold, candidate predicates), so
the two sides cannot silently drift apart.

The prelude is one WITH-chain: tokens -> mentions -> per-type
normalized mentions -> within-doc islands/entities -> across-doc
strong/weak entities -> membership -> social-network edges. DuckDB
inlines unused CTEs, so shipping the full prelude with every query is
free.
"""

from __future__ import annotations

from .functions.normalize import JUNK_RE, JUNK_RE_LOCS, sql_normalize_str
from .operators.coref import CANDIDATE_RULES, LEVENSHTEIN_MAX, MIN_NUM_DOCS
from .operators.mentions import ID_STRIDE, TYPE_BUCKETS

COREF_TYPES = ("PERSON", "ORGANIZATION", "LOCATION")


def _sql_type_case() -> str:
    whens = " ".join(
        "WHEN substr(md5(word),1,1) IN ({}) THEN '{}'".format(
            ", ".join(f"'{ch}'" for ch in chars), t
        )
        for chars, t in TYPE_BUCKETS
    )
    return f"CASE {whens} END"


def _sql_junk(entity_type: str) -> str:
    return JUNK_RE_LOCS if entity_type == "LOCATION" else JUNK_RE


def _sql_strong(entity_type: str, name: str = "norm") -> str:
    r = CANDIDATE_RULES[entity_type]
    tok = f"len(regexp_split_to_array(trim({name}), '\\s+'))"
    cond = (
        f"len({name}) >= {r['chars_min']}"
        f" AND {tok} BETWEEN {r['tokens_min']} AND {r['tokens_max']}"
    )
    if r["charset"]:
        cond += f" AND regexp_matches({name}, '{r['charset']}')"
    return f"({cond})"


def _numbers_match(a: str, b: str) -> str:
    return f"(regexp_extract_all({a}, '\\d+') = regexp_extract_all({b}, '\\d+'))"


def mentions_ctes() -> list[str]:
    """tokens + mentions CTEs (mirror of operators/mentions.py
    ``derive_mentions`` — same ids, types, variants, offsets)."""
    tokens = f"""
tokens AS (
  SELECT doc_id, idx, word FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS idx
    FROM documents
  ) t WHERE word <> ''
)"""
    mentions = f"""
mentions AS (
  SELECT CAST(doc_id * {ID_STRIDE} + idx AS BIGINT) AS mention_id,
         CAST(doc_id AS BIGINT) AS doc_id,
         {_sql_type_case()} AS type,
         CASE WHEN (doc_id * 31 + idx) % 101 = 0 THEN upper(word) || '.'
              WHEN (doc_id * 31 + idx) % 101 = 1 THEN upper(word) || 'X'
              WHEN (doc_id * 31 + idx) % 101 = 2 AND len(word) > 3
                   THEN substr(upper(word), 1, len(word) - 1)
              WHEN (doc_id * 31 + idx) % 101 BETWEEN 3 AND 10 AND nxt IS NOT NULL
                   THEN upper(word) || ' ' || upper(nxt)
              ELSE upper(word) END AS text,
         idx,
         CASE WHEN substr(md5(word), 2, 1) IN ('0', '1')
              THEN 'g_' || word END AS global_id,
         text_start,
         CAST(text_start + len(word) AS BIGINT) AS text_stop
  FROM (
    SELECT doc_id, idx, word,
           lead(word) OVER (PARTITION BY doc_id ORDER BY idx) AS nxt,
           CAST(coalesce(sum(len(word) + 1) OVER (
                PARTITION BY doc_id ORDER BY idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS text_start
    FROM tokens
  ) t2
)"""
    return [tokens, mentions]


def coref_ctes(entity_type: str) -> list[str]:
    """Per-type CTE chain: nm_T (normalize+filter) -> isl_T (islands)
    -> wd_T (within-doc entities) -> strongisl_T -> members_T ->
    across_strong_T / across_weak_T -> membership_T -> docent_T."""
    t = entity_type
    norm = sql_normalize_str("text", _sql_junk(t))
    nm = f"""
nm_{t} AS (
  SELECT * FROM (
    SELECT *, {norm} AS norm FROM mentions WHERE type = '{t}'
  ) x WHERE len(norm) > 0
)"""
    merged = (
        f"prev IS NOT NULL AND levenshtein(prev, norm) <= {LEVENSHTEIN_MAX}"
        f" AND {_numbers_match('prev', 'norm')}"
    )
    isl = f"""
isl_{t} AS (
  SELECT *, SUM(is_new) OVER (
      PARTITION BY doc_id, type ORDER BY norm, mention_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_seq
  FROM (
    SELECT *, CASE WHEN {merged} THEN 0 ELSE 1 END AS is_new
    FROM (
      SELECT *, lag(norm) OVER (
          PARTITION BY doc_id, type ORDER BY norm, mention_id) AS prev
      FROM nm_{t}
    ) y
  ) z
)"""
    wd = f"""
wd_{t} AS (
  SELECT s.entity_id, s.type, c.text,
         'within_doc_{t.lower()}_coref' AS created_by,
         s.num_docs, s.num_mentions, s.doc_id, s.cluster_seq
  FROM (
    SELECT doc_id, type, cluster_seq,
           CAST(min(mention_id) AS BIGINT) AS entity_id,
           CAST(count(*) AS BIGINT) AS num_mentions,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS num_docs
    FROM isl_{t} GROUP BY doc_id, type, cluster_seq
  ) s
  JOIN (
    SELECT doc_id, type, cluster_seq, norm AS text FROM (
      SELECT doc_id, type, cluster_seq, norm, count(*) AS name_cnt,
             row_number() OVER (
               PARTITION BY doc_id, type, cluster_seq
               ORDER BY count(*) DESC, norm ASC) AS rn
      FROM isl_{t} GROUP BY doc_id, type, cluster_seq, norm
    ) nc WHERE rn = 1
  ) c USING (doc_id, type, cluster_seq)
)"""
    strongisl = f"""
strongisl_{t} AS (
  SELECT *, SUM(is_new) OVER (
      PARTITION BY type ORDER BY norm, entity_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a_cluster_seq
  FROM (
    SELECT *, CASE WHEN {merged} THEN 0 ELSE 1 END AS is_new
    FROM (
      SELECT entity_id, type, text AS norm, num_docs, num_mentions, doc_id,
             lag(text) OVER (PARTITION BY type ORDER BY text, entity_id) AS prev
      FROM wd_{t} WHERE {_sql_strong(t, 'text')}
    ) y
  ) z
)"""
    across_strong = f"""
across_strong_{t} AS (
  SELECT s.entity_id, s.type, c.text,
         'across_doc_{t.lower()}_coref' AS created_by,
         s.num_docs, s.num_mentions, s.num_members
  FROM (
    SELECT type, a_cluster_seq,
           CAST(min(entity_id) AS BIGINT) AS entity_id,
           CAST(sum(num_mentions) AS BIGINT) AS num_mentions,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS num_docs,
           CAST(count(*) AS BIGINT) AS num_members
    FROM strongisl_{t} GROUP BY type, a_cluster_seq
  ) s
  JOIN (
    SELECT type, a_cluster_seq, norm AS text FROM (
      SELECT type, a_cluster_seq, norm, count(*) AS name_cnt,
             row_number() OVER (
               PARTITION BY type, a_cluster_seq
               ORDER BY count(*) DESC, norm ASC) AS rn
      FROM strongisl_{t} GROUP BY type, a_cluster_seq, norm
    ) nc WHERE rn = 1
  ) c USING (type, a_cluster_seq)
  WHERE s.num_members >= {MIN_NUM_DOCS}
)"""
    across_weak = f"""
across_weak_{t} AS (
  SELECT CAST(min(entity_id) AS BIGINT) AS entity_id, type, text,
         'weak_across_doc_{t.lower()}_coref' AS created_by,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS num_docs,
         CAST(sum(num_mentions) AS BIGINT) AS num_mentions,
         CAST(count(*) AS BIGINT) AS num_members
  FROM wd_{t} WHERE NOT {_sql_strong(t, 'text')}
  GROUP BY type, text
)"""
    membership = f"""
membership_{t} AS (
  SELECT i.doc_id, i.entity_id AS within_entity_id,
         CAST(m.across_entity_id AS BIGINT) AS across_entity_id
  FROM strongisl_{t} i
  JOIN (
    SELECT type, a_cluster_seq, count(*) AS num_members,
           min(entity_id) AS across_entity_id
    FROM strongisl_{t} GROUP BY type, a_cluster_seq
    HAVING count(*) >= {MIN_NUM_DOCS}
  ) m USING (type, a_cluster_seq)
)"""
    docent = f"""
docent_{t} AS (
  SELECT DISTINCT doc_id, across_entity_id AS entity_id FROM membership_{t}
)"""
    return [nm, isl, wd, strongisl, across_strong, across_weak, membership, docent]


def social_ctes() -> list[str]:
    """Per-doc PERSON pairs -> weighted edges (J2/A7/G2)."""
    pairs = """
sn_pairs AS (
  SELECT a.doc_id, a.entity_id AS src_entity_id, b.entity_id AS dst_entity_id
  FROM docent_PERSON a JOIN docent_PERSON b
    ON a.doc_id = b.doc_id AND a.entity_id < b.entity_id
)"""
    edges = """
sn_edges AS (
  SELECT src_entity_id, dst_entity_id,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS num_docs
  FROM sn_pairs GROUP BY src_entity_id, dst_entity_id
)"""
    return [pairs, edges]


def prelude(types: tuple[str, ...] = COREF_TYPES) -> str:
    ctes: list[str] = []
    ctes += mentions_ctes()
    for t in types:
        ctes += coref_ctes(t)
    ctes += social_ctes()
    return "WITH " + ",".join(ctes)


def wrap(final_select: str, types: tuple[str, ...] = COREF_TYPES) -> str:
    """Full oracle query: shared prelude + final SELECT."""
    return prelude(types) + "\n" + final_select
