"""Document / mention sources (SURVEY.md §2.1 S1, S2, S4, S10).

Reference behavior being re-expressed:

- S1 recursive directory scan: walk a tree, keep one extension, sort
  for determinism (src/Ingester.groovy:197-207). Spark-first: the
  ``binaryFile`` source with ``recursiveFileLookup`` — the listing is
  distributed and the scan is split across executors, unlike the
  reference's single-threaded walk.
- S2 text extraction: any file -> plain text (src/TextExtractor.groovy:
  12-28, Tika). Parity subset decodes UTF-8 bytes JVM-side; richer
  extractors (PDF/Office) plug in as a pandas-UDF ``bytes -> text``
  (Tika itself is not available here; the pluggable seam is the point).
- S4 mention CSV: one row per mention, write order
  (type, start, stop, index, global_id, text)
  (src/EntityExtractor.groovy:21-33; read back src/Ingester.groovy:
  244-251). Fixed schema on read — no inference pass over the data.
- S10 XML->TSV token source: entity-tagged XML -> (token, tag) rows
  (src/XMLToTSVConverter.groovy:70-159). Re-expressed as JVM regex
  segmentation + posexplode (no per-row Python); PTB tokenization is
  reduced to word/punct splitting (documented reduction, SURVEY §2.8
  C14).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# S4 — .ner.csv column order at src/EntityExtractor.groovy:30
MENTION_CSV_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("text_start", T.LongType()),
        T.StructField("text_stop", T.LongType()),
        T.StructField("idx", T.LongType()),
        T.StructField("global_id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def scan_directory(spark: SparkSession, path: str, ext: str = "txt") -> DataFrame:
    """S1 — recursive scan filtered by extension, deterministic order.

    Returns (path, modificationTime, length, content) with content as
    raw bytes. Listing parallelizes on the driver + scan splits by
    file; ``orderBy(path)`` reproduces the reference's sorted walk
    (src/Ingester.groovy:206) only at output time — keep it lazy so
    downstream ops don't inherit a global sort.
    """
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", f"*.{ext}")
        .load(path)
    )


def extract_text(
    binary_docs: DataFrame, extractor: str = "utf8", id_offset: int = 0
) -> DataFrame:
    """S2 — binary file rows -> documents(doc_id, name, path, text).

    ``extractor='utf8'`` decodes JVM-side (whole-stage codegen, no
    Python). Any other extractor name must be registered via
    :func:`register_extractor` (the reference treats the Tika parser
    as a pluggable component; so do we).

    doc_id is a deterministic hash of the path — stable across runs
    and shuffle-free (a row_number would serialize the listing through
    one partition; at 100 TB that is the difference between a metadata
    op and a bottleneck). The hash is bounded to 2^40 so downstream
    id schemes (mention_id = doc_id * ID_STRIDE + idx,
    operators/mentions.py) stay inside a long; collision odds at 10^9
    docs are ~5e-4 under the birthday bound — acceptable for ids;
    callers needing certainty can key on ``path``.
    """
    if extractor == "utf8":
        text = F.decode(F.col("content"), "UTF-8")
    elif extractor in _EXTRACTORS:
        # registered extractors may be Arrow-batched pandas UDFs whose
        # code lives in this package — ship it so executor Python
        # workers can import it (idempotent; no-op for Column logic)
        from ..session import ship_package

        ship_package(binary_docs.sparkSession)
        text = _EXTRACTORS[extractor](F.col("content"))
    else:
        raise NotImplementedError(
            f"extractor {extractor!r} not registered; Tika-class parsers "
            "are external components (src/TextExtractor.groovy:6)"
        )
    return binary_docs.select(
        (F.pmod(F.xxhash64("path"), F.lit(1 << 40)) + F.lit(id_offset)).alias("doc_id"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.col("path").alias("path"),
        text.alias("text"),
    )


#: one PDF literal string `(...)` with escapes; group 1 = the body
_PDF_STR_RE = r"\(((?:\\.|[^\\()])*)\)"
#: one text-showing op: `(s) Tj`, `(s) '`, or `[(a) -120 (b)] TJ`
_PDF_SHOW_RE = r"(?s)(?:\((?:\\.|[^\\()])*\)\s*(?:Tj|')|\[(?:\\.|[^\]\\])*\]\s*TJ)"
_PDF_ESC_MARK = "\x02"


def html_extract(content: "F.Column") -> "F.Column":
    """Minimal HTML/XML text extractor (what Tika's HtmlParser does for
    the common case, src/TextExtractor.groovy:12-28): drop
    script/style subtrees and comments, strip tags, decode entities,
    collapse whitespace. Pure Column regexp logic — stays in
    whole-stage codegen; at 100 TB extraction is part of the scan
    stage, zero extra shuffles. Entities decode AFTER tag-stripping so
    ``&lt;p&gt;`` in prose survives as text instead of becoming a tag.
    """
    from ..functions.text import xml_unescape

    t = F.decode(content, "UTF-8")
    t = F.regexp_replace(t, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    t = xml_unescape(t)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def pdf_extract(content: "F.Column") -> "F.Column":
    """Minimal PDF text extractor: pulls literal strings out of the
    text-showing operators (``(s) Tj``, ``(s) '``, ``[..] TJ``) in
    UNCOMPRESSED content streams and undoes PDF string escapes.
    Honest scope note: Flate/LZW-compressed streams and hex strings
    need a real PDF library — this covers the uncompressed subset the
    way `strings`+`grep` would, but exactly and under the oracle gate.
    Decoding is ISO-8859-1 (PDF bytes are not UTF-8; latin-1 is the
    identity byte map).
    """
    raw = F.decode(content, "ISO-8859-1")
    shows = F.regexp_extract_all(raw, F.lit(_PDF_SHOW_RE), 0)

    def strings_of(op: "F.Column") -> "F.Column":
        return F.array_join(
            F.regexp_extract_all(op, F.lit(_PDF_STR_RE), 1), ""
        )

    joined = F.array_join(F.transform(shows, strings_of), " ")
    # PDF escapes: \\ first (via sentinel), then \( \) \n \r \t
    s = F.replace(joined, F.lit("\\\\"), F.lit(_PDF_ESC_MARK))
    for esc, ch in (("\\(", "("), ("\\)", ")"), ("\\n", "\n"),
                    ("\\r", "\r"), ("\\t", "\t")):
        s = F.replace(s, F.lit(esc), F.lit(ch))
    return F.replace(s, F.lit(_PDF_ESC_MARK), F.lit("\\"))


# --- DOCX (S2: the most common Tika format after txt/html/pdf,
# src/TextExtractor.groovy:12-28). A .docx is a zip whose main part is
# word/document.xml; text lives in <w:t> runs grouped into <w:p>
# paragraphs. stdlib zipfile + regex — zero new dependencies. Python
# is unavoidable here (zip inflation is not expressible in Column
# algebra), so it runs as an Arrow-batched pandas UDF: extraction
# stays in the scan stage, no shuffle, ~10-100x over row-at-a-time.

_XML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&amp;", "&"),  # &amp; last — unescape once
)


def _docx_text_of_bytes(b) -> str | None:
    import io as _io
    import re as _re
    import zipfile

    if b is None:
        return None
    try:
        with zipfile.ZipFile(_io.BytesIO(bytes(b))) as zf:
            xml = zf.read("word/document.xml").decode("utf-8", "replace")
    except Exception:  # not a zip / no document part — not a docx
        return None
    paras = []
    for p in _re.findall(r"(?s)<w:p[ >].*?</w:p>|<w:p/>", xml):
        runs = _re.findall(r"(?s)<w:t(?: [^>]*)?>(.*?)</w:t>", p)
        paras.append("".join(runs))
    out = " ".join(paras)
    for ent, ch in _XML_ENTITIES:
        out = out.replace(ent, ch)
    return _re.sub(r"\s+", " ", out).strip()


_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _docx_bytes_of_text(text: str) -> bytes:
    """Render text as a minimal valid .docx (one paragraph per newline
    run). Fixture/round-trip helper for the extractor above; fixed zip
    timestamps keep output deterministic."""
    import io as _io
    import zipfile

    esc = (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        '<w:body><w:p><w:r><w:t xml:space="preserve">'
        + esc
        + "</w:t></w:r></w:p></w:body></w:document>"
    )
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in (
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
            ("_rels/.rels", _DOCX_RELS),
            ("word/document.xml", doc),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data, compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


@F.pandas_udf(T.StringType())
def _docx_extract_udf(content: pd.Series) -> pd.Series:
    return content.map(_docx_text_of_bytes)


# --- ODT (OpenDocument text): zip + content.xml, text in <text:p>/<text:h>
# paragraphs with nested spans — same machinery as DOCX.

def _odt_text_of_bytes(b) -> str | None:
    import io as _io
    import re as _re
    import zipfile

    if b is None:
        return None
    try:
        with zipfile.ZipFile(_io.BytesIO(bytes(b))) as zf:
            xml = zf.read("content.xml").decode("utf-8", "replace")
    except Exception:
        return None
    paras = []
    for p in _re.findall(r"(?s)<text:[ph][ >].*?</text:[ph]>", xml):
        inner = _re.sub(r"(?s)<[^>]+>", "", p)
        paras.append(inner)
    out = " ".join(paras)
    for ent, ch in _XML_ENTITIES:
        out = out.replace(ent, ch)
    return _re.sub(r"\s+", " ", out).strip()


def _odt_bytes_of_text(text: str) -> bytes:
    import io as _io
    import zipfile

    esc = (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:text><text:p><text:span>"
        + esc
        + "</text:span></text:p></office:text></office:body>"
        "</office:document-content>"
    )
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in (
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("content.xml", content),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, data, compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


@F.pandas_udf(T.StringType())
def _odt_extract_udf(content: pd.Series) -> pd.Series:
    return content.map(_odt_text_of_bytes)


@F.pandas_udf(T.BinaryType())
def render_odt(text: pd.Series) -> pd.Series:
    return text.map(lambda t: None if t is None else _odt_bytes_of_text(t))


def odt_extract(content: "F.Column") -> "F.Column":
    return _odt_extract_udf(content)


# --- RTF: text-based format, extractable with pure Column regex (JVM,
# scan-stage, same family as html/pdf). Documented subset: character
# escapes (\\ \{ \}), \par/\tab/\line breaks, skip-destinations
# ({\*\...} without nested braces), control-word stripping. Nested
# destination groups (\fonttbl with embedded groups) need a real
# parser — out of the honest subset, like compressed PDF streams.

_RTF_ESC = {"\\\\": "\x02", "\\{": "\x03", "\\}": "\x04"}


def rtf_extract(content: "F.Column") -> "F.Column":
    t = F.decode(content, "UTF-8")
    for esc, mark in _RTF_ESC.items():
        t = F.replace(t, F.lit(esc), F.lit(mark))
    t = F.regexp_replace(t, r"\{\\\*[^{}]*\}", " ")  # skip-destinations
    t = F.regexp_replace(t, r"\\(par|tab|line)\b ?", " ")
    t = F.regexp_replace(t, r"\\[a-zA-Z]+-?[0-9]* ?", "")  # control words
    t = F.regexp_replace(t, r"[{}]", " ")
    for esc, mark in (("\\", "\x02"), ("{", "\x03"), ("}", "\x04")):
        t = F.replace(t, F.lit(mark), F.lit(esc))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def rtf_render(text: "F.Column") -> "F.Column":
    """Column-side RTF fixture renderer (inverse of the extractor's
    subset): escape the three specials, wrap in a document group."""
    esc = F.replace(text, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("{"), F.lit("\\{"))
    esc = F.replace(esc, F.lit("}"), F.lit("\\}"))
    return F.concat(
        F.lit("{\\rtf1\\ansi\\deff0 "),
        esc,
        F.lit("\\par}"),
    )


@F.pandas_udf(T.BinaryType())
def render_docx(text: pd.Series) -> pd.Series:
    return text.map(lambda t: None if t is None else _docx_bytes_of_text(t))


def docx_extract(content: "F.Column") -> "F.Column":
    return _docx_extract_udf(content)


_EXTRACTORS: dict = {
    "html": html_extract,
    "pdf": pdf_extract,
    "docx": docx_extract,
    "odt": odt_extract,
    "rtf": rtf_extract,
}


def register_extractor(name: str, fn) -> None:
    """Register a ``Column -> Column`` (or pandas-UDF) text extractor."""
    _EXTRACTORS[name] = fn


def read_mentions_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4 — read .ner.csv mention files with the fixed schema (no
    inference scan)."""
    return spark.read.csv(path, schema=MENTION_CSV_SCHEMA, header=False)


# S10 — one <TAG>span</TAG> or a run of untagged text
_SEGMENT_RE = r"<([A-Z]+)>(.*?)</\1>|([^<]+)"
_TOKEN_RE = r"[A-Za-z0-9'-]+|[^\sA-Za-z0-9]"


def xml_to_token_tags(tagged_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """S10 — entity-tagged XML text -> one row per (doc, token, tag).

    Tags inside <PERSON>..</PERSON>-style spans get the element name,
    everything else 'O' (src/XMLToTSVConverter.groovy:29-40 semantics).
    All JVM regex (regexp_extract_all + posexplode); per-doc token
    order is preserved by (seg_pos, tok_pos) so the TSV sink can write
    the original sequence.
    """
    segs = tagged_docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SEGMENT_RE), F.lit(0))
        ).alias("seg_pos", "segment"),
    )
    segs = segs.select(
        "doc_id",
        "seg_pos",
        F.when(
            F.col("segment").startswith("<"),
            F.regexp_extract("segment", _SEGMENT_RE, 1),
        )
        .otherwise("O")
        .alias("tag"),
        F.when(
            F.col("segment").startswith("<"),
            F.regexp_extract("segment", _SEGMENT_RE, 2),
        )
        .otherwise(F.col("segment"))
        .alias("seg_text"),
    )
    toks = segs.select(
        "doc_id",
        "seg_pos",
        "tag",
        F.posexplode(
            F.regexp_extract_all(F.col("seg_text"), F.lit(_TOKEN_RE), F.lit(0))
        ).alias("tok_pos", "token"),
    )
    return toks.select(
        "doc_id",
        "token",
        "tag",
        (F.col("seg_pos") * 100000 + F.col("tok_pos")).alias("token_seq"),
    )
