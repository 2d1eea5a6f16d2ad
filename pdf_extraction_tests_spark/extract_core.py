"""Pure pandas/numpy per-document extraction kernel.

This module is the *semantics* of the engine: a deterministic, single-process
re-expression of the reference's per-document pipeline
(``Document_Processor_DocLayout_YOLO_Code_v10.R``).  The Spark layer
(:mod:`pdf_extraction_tests_spark.pipeline`) only distributes calls to these
functions over Arrow batches — so the same code doubles as the local oracle
for differential tests (SURVEY.md §5).

Per-document stages and their reference counterparts:

  parse spans -> region table      v10.R:26-179 (pdf_convert + YOLO + OCR)
  region filters                   v10.R:108, 173-175 (P1-P3 in SURVEY §2.2)
  column detection (largest gap)   v10.R:569-583 (A8); accept thresholds :551
  reading-order sort               v10.R:176, 271-274 (O1/O2)
  document format detection        v10.R:599-675 (A5 weighted regex argmax)
  title / authors / abstract       v10.R:1912-1957, 1085-1195, 1281-1531
  boilerplate strip                v10.R:1661-1685 (P8)
  boundary scan (intro..refs)      v10.R:1691-1776, 2007-2038 (W5)
  group-concat + sentence dedup    v10.R:1788-1814 (A1/A10)
  cleaning pipelines               v10.R:3431-3525 (§2.8)
  span emission                    output invariant: exact span-sequence
                                   equality (kind, text, media_ref, order)

No Spark imports here — keep the kernel testable without a JVM.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Constants mirrored from the reference
# ---------------------------------------------------------------------------

# element classes kept for OCR/extraction (v10.R:108)
KEEP_TYPES = ("plain text", "title", "abandon")

# "substantial" region pre-filter before column detection (v10.R:524-530)
SUBSTANTIAL_MIN_CHARS = 20
SUBSTANTIAL_MIN_AREA = 1000
SUBSTANTIAL_SKIP_RE = re.compile(r"^(?:page|doi|figure|table)\s", re.IGNORECASE)

# column detection thresholds (v10.R:551, 575)
COLUMN_GAP_FRACTION = 0.15  # max x-gap must exceed 0.15 * page width
COLUMN_MIN_SUBSTANTIAL = 4  # need at least 4 substantial regions

# format detection: weighted regex hits -> argmax (v10.R:603-674)
FORMAT_RULES: dict[str, list[tuple[str, float]]] = {
    "mdpi": [
        (r"\bmdpi\b", 3.0),
        (r"academic editor", 2.0),
        (r"\bcitation:", 2.0),
        (r"received:.*accepted:", 2.0),
    ],
    "nature": [
        (r"\bnature\b", 2.0),
        (r"springer", 1.0),
        (r"nature research", 2.0),
    ],
    "jac": [
        (r"journal of antimicrobial chemotherapy", 3.0),
        (r"\bjac\b", 1.0),
        (r"objectives:", 1.0),
        (r"\bmethods:", 1.0),
    ],
    "jsm": [
        (r"journal of sports medicine", 3.0),
        (r"\bjsm\b", 1.0),
    ],
    "elsevier": [
        (r"elsevier", 3.0),
        (r"sciencedirect", 2.0),
        (r"article info", 1.0),
    ],
}
DEFAULT_FORMAT = "generic_academic"

# MDPI-style front-matter / boilerplate strip (v10.R:1661-1685)
BOILERPLATE_PATTERNS = [
    r"^academic editor[s]?:",
    r"^received:",
    r"^accepted:",
    r"^published:",
    r"^revised:",
    r"^citation:",
    r"^copyright",
    r"licensee mdpi",
    r"creativecommons\.org",
    r"creative commons",
    r"^\*?\s*correspondence",
    r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    r"^orcid",
    r"doi\.org",
    r"^\*\s",
    r"this article is an open access",
]
BOILERPLATE_RE = re.compile("|".join(BOILERPLATE_PATTERNS), re.IGNORECASE)

# boundary scan markers (v10.R:1691-1720 intro; :1722-1776, 1866-1878 end)
INTRO_RE = re.compile(r"^(1[\.\)]?\s*)?introduction\b", re.IGNORECASE)
END_RE = re.compile(
    r"^(references|bibliography|acknowledg(e)?ments?|author contributions?"
    r"|funding|conflicts? of interest|data availability|supplementary material)",
    re.IGNORECASE,
)
ABSTRACT_HEADER_RE = re.compile(r"^abstract\b[:.]?\s*", re.IGNORECASE)

# author scoring (v10.R:1085-1103, 1171-1195)
NAME_RE = re.compile(r"[A-Z][a-z]+\s+[A-Z][a-z]+")
AUTHOR_PENALTY_RE = re.compile(r"abstract|introduction|keywords|received", re.IGNORECASE)

# cleaning pipelines (v10.R:3431-3498)
_WS_RE = re.compile(r"\s+")
_CITATION_RE = re.compile(r"\[\d+(?:[,–-]\s*\d+)*\]")
_DEHYPHEN_RE = re.compile(r"([a-z])-\s+([a-z])")
_PH_RE = re.compile(r"\bp\s*H\b")
_NM_RE = re.compile(r"(\d+)\s*nm\b")
_SUPERSCRIPT_RE = re.compile(r"(?<=[a-zA-Z])[\*†‡§](?=[\s,;]|$)")

# HTML boilerplate heuristics (north_star: text-density / link-density)
_HTML_BLOCK_RE = re.compile(
    r"<(h[1-6]|p|div|li|blockquote|pre|td|nav|footer|header|aside|script|style)\b[^>]*>"
    r"(.*?)</\1>",
    re.IGNORECASE | re.DOTALL,
)
_HTML_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)
_HTML_TAG_RE = re.compile(r"<[^>]+>")
_HTML_DROP_TAGS = {"nav", "footer", "header", "aside", "script", "style"}
HTML_LINK_DENSITY_MAX = 0.5
HTML_MIN_BLOCK_CHARS = 10


# ---------------------------------------------------------------------------
# Span parsing: interleaved input spans -> region table
# ---------------------------------------------------------------------------

REGION_COLUMNS = [
    "page",
    "x",
    "y",
    "w",
    "h",
    "text",
    "element_type",
    "media_ref",
    "offset",
    "parse_failure",
]


def parse_region_payload(payload: str) -> tuple[int, int, int, int, int, str, str] | None:
    """Parse the in-band region payload ``"page,x,y,w,h,element_type|text"``.

    Stands in for the reference's per-page YOLO + per-box tesseract boundary
    (v10.R:39-44, 131-152); malformed payloads are counted as parse failures,
    not raised — page-level fault isolation per v10.R:37, 188-190.
    """
    try:
        header, text = payload.split("|", 1)
        page_s, x_s, y_s, w_s, h_s, etype = header.split(",", 5)
        return (int(page_s), int(x_s), int(y_s), int(w_s), int(h_s), etype, text)
    except (ValueError, AttributeError):
        return None


def strip_html_blocks(fragment: str) -> list[tuple[str, str]]:
    """Boilerplate-strip an HTML fragment via text/link-density heuristics.

    Returns ``[(element_type, text), ...]`` in document order.  Blocks inside
    nav/footer/aside/script/style, blocks with link density > 0.5, and blocks
    shorter than 10 chars are dropped (classic boilerpipe-style rules; the
    north_star mandates "boilerplate stripping via text-density/link-density
    DOM heuristics").
    """
    out: list[tuple[str, str]] = []
    for m in _HTML_BLOCK_RE.finditer(fragment or ""):
        tag = m.group(1).lower()
        inner = m.group(2)
        if tag in _HTML_DROP_TAGS:
            continue
        link_chars = sum(
            len(_HTML_TAG_RE.sub("", a.group(1))) for a in _HTML_A_RE.finditer(inner)
        )
        text = _WS_RE.sub(" ", _HTML_TAG_RE.sub("", inner)).strip()
        if len(text) < HTML_MIN_BLOCK_CHARS:
            continue
        if link_chars / max(len(text), 1) > HTML_LINK_DENSITY_MAX:
            continue
        etype = "title" if tag in ("h1", "h2") else "plain text"
        out.append((etype, text))
    return out


def spans_to_regions(spans: Iterable[dict]) -> pd.DataFrame:
    """Convert one document's input spans to a region table.

    ``spans`` is an iterable of dicts with keys kind/text/media_ref/offset.
    Media spans become placeholder rows (re-anchored to the geometry of the
    preceding block by :func:`reanchor_media`, which must run on the fully
    assembled table — this keeps per-chunk parsing order-independent so the
    oversized-doc path can parse chunks in parallel); parse failures become
    counter rows (parse_failure=1).
    """
    rows: list[tuple] = []
    for sp in spans:
        kind = sp.get("kind")
        text = sp.get("text")
        offset = sp.get("offset")
        offset = int(offset) if offset is not None else len(rows)
        if kind == "region":
            parsed = parse_region_payload(text or "")
            if parsed is None:
                rows.append((0, 0, 0, 0, 0, "", "parse_failure", None, offset, 1))
                continue
            page, x, y, w, h, etype, btext = parsed
            rows.append((page, x, y, w, h, btext, etype, None, offset, 0))
        elif kind == "html":
            for i, (etype, btext) in enumerate(strip_html_blocks(text)):
                # synthetic geometry: single column, document order == y order
                yy = offset * 1000 + i * 10
                rows.append((1, 0, yy, 1000, 10, btext, etype, None, offset, 0))
        elif kind == "media":
            rows.append((0, 0, 0, 0, 0, "", "media", sp.get("media_ref"), offset, 0))
        else:  # plain 'text' span: pre-extracted block, order by offset
            yy = offset * 1000
            rows.append((1, 0, yy, 1000, 10, text or "", "plain text", None, offset, 0))
    return pd.DataFrame(rows, columns=REGION_COLUMNS)


def reanchor_media(regions: pd.DataFrame) -> pd.DataFrame:
    """Anchor each media row at the geometry of the preceding block.

    Media has no layout coordinates; to keep it interleaved at its reading
    position it inherits (page, x, y) from the last text-bearing row before
    it in input (offset) order — the ``offset`` tiebreak in
    :func:`reading_order` then places it immediately after that block.
    Runs on the assembled per-document table so chunk-parallel parsing and
    single-pass parsing yield identical results.
    """
    if regions.empty or not (regions["element_type"] == "media").any():
        return regions
    out = regions.sort_values("offset", kind="stable").reset_index(drop=True)
    page, ax, ay = 1, 0, -1
    pages = out["page"].to_numpy().copy()
    xs = out["x"].to_numpy().copy()
    ys = out["y"].to_numpy().copy()
    etypes = out["element_type"].to_numpy()
    for i in range(len(out)):
        if etypes[i] == "media":
            pages[i], xs[i], ys[i] = page, ax, ay
        elif etypes[i] != "parse_failure":
            page, ax, ay = pages[i], xs[i], ys[i]
    out["page"], out["x"], out["y"] = pages, xs, ys
    return out


# ---------------------------------------------------------------------------
# Region filters (SURVEY §2.2 P1-P3)
# ---------------------------------------------------------------------------


def filter_regions(regions: pd.DataFrame) -> pd.DataFrame:
    """Apply the reference's pre-extraction region filters.

    P3 keep {plain text, title, abandon} (v10.R:108); P1 non-empty text
    (v10.R:173); P2 drop 'abandon' on pages > 1 (kept on page 1 for format
    detection, v10.R:174-175).  'media' rows always survive.
    """
    r = regions
    is_media = r["element_type"] == "media"
    keep_type = r["element_type"].isin(KEEP_TYPES)
    nonempty = r["text"].fillna("").str.strip().str.len() > 0
    abandon_late = (r["element_type"] == "abandon") & (r["page"] > 1)
    return r[(is_media | (keep_type & nonempty & ~abandon_late))].copy()


# ---------------------------------------------------------------------------
# Column detection + reading order (SURVEY §2.4 A6/A8, §2.6 O1/O2)
# ---------------------------------------------------------------------------


def detect_column_boundary(page_df: pd.DataFrame) -> float | None:
    """Largest-gap column boundary for one page (v10.R:569-583).

    Deterministic replacement for the reference's seed-dependent
    ``kmeans(nstart=20)`` (v10.R:542-567): round x-centers to 10s, sort
    unique, take the largest gap; accept iff gap > 0.15 * page width and
    both sides are non-empty.  Same accept thresholds as v10.R:551/575.
    """
    sub = page_df[
        (page_df["text"].str.len() > SUBSTANTIAL_MIN_CHARS)
        & (page_df["w"] * page_df["h"] > SUBSTANTIAL_MIN_AREA)
        & ~page_df["text"].str.contains(SUBSTANTIAL_SKIP_RE, na=False)
    ]
    if len(sub) < COLUMN_MIN_SUBSTANTIAL:
        return None
    page_width = float((page_df["x"] + page_df["w"]).max())
    if page_width <= 0:
        return None
    x_centers = (sub["x"] + sub["w"] / 2.0).to_numpy()
    xs = np.unique(np.round(x_centers / 10.0) * 10.0)
    if len(xs) < 2:
        return None
    gaps = np.diff(xs)
    gi = int(np.argmax(gaps))
    if gaps[gi] <= COLUMN_GAP_FRACTION * page_width:
        return None
    boundary = (xs[gi] + xs[gi + 1]) / 2.0
    left = (x_centers < boundary).sum()
    if left == 0 or left == len(x_centers):
        return None
    return float(boundary)


def reading_order(regions: pd.DataFrame) -> pd.DataFrame:
    """Column-aware reading-order sort: (page, column, y, x, offset).

    The reference sorts arrange(page, y, x) (v10.R:176) then re-sorts pages
    with a detected column boundary as arrange(column, y, x) (v10.R:271-274).
    ``offset`` is the explicit deterministic tiebreak (SURVEY §7 risk note) so
    two runs can never disagree on ties.
    """
    if regions.empty:
        out = regions.copy()
        out["column"] = pd.Series(dtype="int64")
        out["row_id"] = pd.Series(dtype="int64")
        return out
    parts = []
    for page, pdf in regions.groupby("page", sort=True):
        boundary = detect_column_boundary(pdf[pdf["element_type"] != "media"])
        pdf = pdf.copy()
        if boundary is None:
            pdf["column"] = 1
        else:
            pdf["column"] = np.where((pdf["x"] + pdf["w"] / 2.0) < boundary, 1, 2)
        parts.append(pdf)
    out = pd.concat(parts, ignore_index=True)
    out = out.sort_values(
        ["page", "column", "y", "x", "offset"], kind="stable"
    ).reset_index(drop=True)
    out["row_id"] = np.arange(len(out))
    return out


# ---------------------------------------------------------------------------
# Format detection (SURVEY §2.4 A5)
# ---------------------------------------------------------------------------


def detect_document_format(regions: pd.DataFrame) -> str:
    """Weighted-regex argmax over page-1 abandon + plain-text blobs
    (v10.R:599-675; scoring table :623-656, argmax :672)."""
    p1 = regions[
        (regions["page"] <= 1)
        & regions["element_type"].isin(("abandon", "plain text"))
    ]
    blob = " ".join(p1["text"].fillna("")).lower()
    best, best_score = DEFAULT_FORMAT, 0.0
    for fmt, rules in FORMAT_RULES.items():
        score = sum(wt for pat, wt in rules if re.search(pat, blob))
        if score > best_score:
            best, best_score = fmt, score
    return best if best_score >= 2.0 else DEFAULT_FORMAT


# ---------------------------------------------------------------------------
# Title / authors / abstract (SURVEY §2.10 U6 scoring heuristics)
# ---------------------------------------------------------------------------


def extract_title(ordered: pd.DataFrame) -> tuple[str, int]:
    """Score-argmax title pick on page 1 (v10.R:1912-1957).

    Returns (title, row_id) — row_id -1 if none found.
    """
    p1 = ordered[(ordered["page"] <= 1) & (ordered["element_type"] != "media")]
    if p1.empty:
        return "", -1
    page_h = float(p1["y"].max()) if len(p1) else 0.0
    cands = p1[(p1["element_type"] == "title") | (p1["y"] <= 0.3 * max(page_h, 1.0))]
    if cands.empty:
        return "", -1
    txt = cands["text"].fillna("")
    n = txt.str.len()
    words = txt.str.split().map(len).clip(lower=1)
    cap_words = txt.map(lambda s: sum(1 for wd in s.split() if wd[:1].isupper()))
    score = (
        2.0 * (cands["element_type"] == "title").astype(float)
        + 1.0 * ((n >= 20) & (n <= 200)).astype(float)
        + 1.5 * (cands["y"] < 500).astype(float)
        + (cap_words / words)
        - 2.0 * txt.str.lower().str.match("abstract|introduction|keywords").astype(float)
    )
    best = cands.assign(_s=score).sort_values(
        ["_s", "y", "row_id"], ascending=[False, True, True], kind="stable"
    ).iloc[0]
    return str(best["text"]), int(best["row_id"])


def extract_authors(ordered: pd.DataFrame, title_row: int) -> str:
    """Author-line pick by name-count score (v10.R:1085-1115).

    author_score = #"First Last" matches + #commas + digit-superscript bonus,
    penalized for section-header words; argmax desc(score), asc(y)
    (v10.R:1102-1115).
    """
    p1 = ordered[(ordered["page"] <= 1) & (ordered["element_type"] != "media")]
    if title_row >= 0:
        p1 = p1[p1["row_id"] > title_row]
    if p1.empty:
        return ""
    txt = p1["text"].fillna("")
    name_counts = txt.map(lambda s: len(NAME_RE.findall(s)))
    commas = txt.str.count(",")
    digits = txt.str.contains(r"\d").astype(int)
    penalty = txt.map(lambda s: 5.0 if AUTHOR_PENALTY_RE.search(s) else 0.0)
    length_pen = (txt.str.len() > 300).astype(float) * 5.0
    score = name_counts * 2.0 + commas * 0.5 + digits * 0.5 - penalty - length_pen
    cand = p1.assign(_s=score)
    cand = cand[cand["_s"] >= 2.0]
    if cand.empty:
        return ""
    best = cand.sort_values(
        ["_s", "y", "row_id"], ascending=[False, True, True], kind="stable"
    ).iloc[0]
    return str(best["text"])


def extract_abstract(ordered: pd.DataFrame, title_row: int) -> tuple[str, int]:
    """Abstract pick (v10.R:1281-1302, 1340-1531; simple path :1974-2004).

    Preference 1: a region starting with 'Abstract' (header stripped).
    Preference 2: longest page-1 region with > 200 chars after the title.
    Returns (abstract, row_id) — row_id -1 if none.
    """
    body = ordered[ordered["element_type"].isin(("plain text", "title"))]
    hdr = body[body["text"].fillna("").str.match(ABSTRACT_HEADER_RE)]
    if not hdr.empty:
        row = hdr.iloc[0]
        text = ABSTRACT_HEADER_RE.sub("", str(row["text"]), count=1).strip()
        if len(text) < 40:  # bare header: abstract body is the next region
            nxt = body[body["row_id"] > row["row_id"]]
            if not nxt.empty:
                text = (text + " " + str(nxt.iloc[0]["text"])).strip()
                return text, int(nxt.iloc[0]["row_id"])
        return text, int(row["row_id"])
    p1 = body[(body["page"] <= 1) & (body["row_id"] > title_row)]
    cands = p1[p1["text"].fillna("").str.len() > 200]
    if cands.empty:
        return "", -1
    best = cands.assign(_n=cands["text"].str.len()).sort_values(
        ["_n", "row_id"], ascending=[False, True], kind="stable"
    ).iloc[0]
    return str(best["text"]), int(best["row_id"])


# ---------------------------------------------------------------------------
# Boilerplate strip + boundary scan (SURVEY §2.2 P8, §2.5 W5)
# ---------------------------------------------------------------------------


def strip_boilerplate(ordered: pd.DataFrame) -> pd.DataFrame:
    """Drop front-matter boilerplate rows (v10.R:1661-1685) and renumber
    (W2, v10.R:1685)."""
    txt = ordered["text"].fillna("")
    mask = txt.str.contains(BOILERPLATE_RE, na=False) & (
        ordered["element_type"] != "media"
    )
    out = ordered[~mask].reset_index(drop=True)
    out["row_id"] = np.arange(len(out))
    return out


def scan_boundaries(clean: pd.DataFrame, abstract_row: int) -> tuple[int, int]:
    """Conditional-window boundary extraction (v10.R:1691-1776, 2007-2038).

    start = first row matching the intro pattern (fallback: first body row
    after the abstract); end = first end-matter marker after start
    (fallback: one past the last row).  Returns (start_row_id, end_row_id)
    with the slice semantics rows [start, end) — cf. golden boundaries
    start=15 end=88 (v10_ALTAIR.R:3764-3769).
    """
    body = clean[clean["element_type"].isin(("plain text", "title"))]
    if body.empty:
        return (0, 0)
    txt = body["text"].fillna("")
    intro = body[txt.str.match(INTRO_RE)]
    if not intro.empty:
        start = int(intro["row_id"].iloc[0])
    elif abstract_row >= 0:
        after = body[body["row_id"] > abstract_row]
        start = int(after["row_id"].iloc[0]) if not after.empty else int(body["row_id"].iloc[0])
    else:
        start = int(body["row_id"].iloc[0])
    endm = body[txt.str.match(END_RE) & (body["row_id"] > start)]
    end = int(endm["row_id"].iloc[0]) if not endm.empty else int(body["row_id"].iloc[-1]) + 1
    return (start, end)


# ---------------------------------------------------------------------------
# Cleaning (SURVEY §2.8) + sentence dedup (A10)
# ---------------------------------------------------------------------------


def dedupe_sentences(text: str) -> str:
    """Order-preserving sentence distinct (v10.R:1808-1814): split '. ',
    unique keeping first occurrence, rejoin."""
    parts = text.split(". ")
    seen: set[str] = set()
    out = []
    for p in parts:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return ". ".join(out)


def clean_text(text: str, method: str = "hybrid") -> str:
    """Regex cleaning pipelines (v10.R:3431-3498, dispatch :3518-3525).

    'aggressive': whitespace collapse + citation strip + superscript strip.
    'academic' : adds dehyphenation + unit normalization (pH, nm).
    'hybrid'   : aggressive then academic (default, v10.R:3474-3498).
    """
    if not text:
        return ""
    s = text
    if method in ("aggressive", "hybrid"):
        s = _CITATION_RE.sub("", s)
        s = _SUPERSCRIPT_RE.sub("", s)
    if method in ("academic", "hybrid"):
        s = _DEHYPHEN_RE.sub(r"\1\2", s)
        s = _PH_RE.sub("pH", s)
        s = _NM_RE.sub(r"\1 nm", s)
    s = _WS_RE.sub(" ", s).strip()
    return s


# ---------------------------------------------------------------------------
# Whole-document extraction
# ---------------------------------------------------------------------------

EXTRACT_RESULT_COLUMNS = [
    "doc_id",
    "spans",
    "title",
    "authors",
    "abstract",
    "main_text",
    "boundary_start",
    "boundary_end",
    "document_format",
    "total_pages",
    "total_text_regions",
    "parse_failures",
]


def extract_from_regions(doc_id: str, regions: pd.DataFrame,
                         cleaning_method: str = "hybrid") -> dict:
    """Run the full extraction given an already-parsed region table."""
    parse_failures = int(regions["parse_failure"].sum()) if len(regions) else 0
    regions = reanchor_media(regions[regions["parse_failure"] == 0])
    kept = filter_regions(regions)
    ordered = reading_order(kept)
    doc_format = detect_document_format(ordered)
    title, title_row = extract_title(ordered)
    authors = extract_authors(ordered, title_row)
    clean = strip_boilerplate(ordered)
    # recompute title row id after renumbering (the title text is stable)
    if title:
        hit = clean[(clean["text"] == title)]
        title_row2 = int(hit["row_id"].iloc[0]) if not hit.empty else -1
    else:
        title_row2 = -1
    abstract, abstract_row = extract_abstract(clean, title_row2)
    start, end = scan_boundaries(clean, abstract_row)
    body = clean[
        (clean["row_id"] >= start)
        & (clean["row_id"] < end)
        & clean["element_type"].isin(("plain text", "title"))
    ]
    main_raw = " ".join(body["text"].fillna(""))
    main_text = clean_text(dedupe_sentences(main_raw), cleaning_method)

    # span emission: every surviving non-abandon block in reading order,
    # media interleaved at its position; order = 0..n-1
    emit = clean[clean["element_type"].isin(("plain text", "title", "media"))]
    spans = []
    for order, (_, row) in enumerate(emit.iterrows()):
        if row["element_type"] == "media":
            spans.append(
                {"kind": "media", "text": "", "media_ref": row["media_ref"], "order": order}
            )
        else:
            kind = "title" if row["element_type"] == "title" else "text"
            spans.append(
                {
                    "kind": kind,
                    "text": clean_text(str(row["text"]), cleaning_method),
                    "media_ref": None,
                    "order": order,
                }
            )
    n_text_regions = int((kept["element_type"].isin(("plain text", "title"))).sum())
    pages = kept[kept["element_type"] != "media"]["page"]
    return {
        "doc_id": doc_id,
        "spans": spans,
        "title": clean_text(title, cleaning_method),
        "authors": clean_text(authors, cleaning_method),
        "abstract": clean_text(abstract, cleaning_method),
        "main_text": main_text,
        "boundary_start": start,
        "boundary_end": end,
        "document_format": doc_format,
        "total_pages": int(pages.max()) if len(pages) else 0,
        "total_text_regions": n_text_regions,
        "parse_failures": parse_failures,
    }


def extract_document(doc_id: str, spans: Iterable[dict],
                     cleaning_method: str = "hybrid") -> dict:
    """spans-in -> extracted-doc-out; the per-document unit of work."""
    regions = spans_to_regions(spans)
    return extract_from_regions(doc_id, regions, cleaning_method)


def extract_docs_frame(pdf: pd.DataFrame, cleaning_method: str = "hybrid") -> pd.DataFrame:
    """Extract every document in a nested (doc_id, spans) pandas frame.

    This is the body of the Spark ``mapInPandas`` stage and, called directly,
    the single-process local oracle for differential tests.
    """
    results = [
        extract_document(row.doc_id, row.spans or [], cleaning_method)
        for row in pdf.itertuples(index=False)
    ]
    if not results:
        return pd.DataFrame(columns=EXTRACT_RESULT_COLUMNS)
    return pd.DataFrame(results, columns=EXTRACT_RESULT_COLUMNS)
