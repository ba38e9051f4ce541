"""HTML visible-text extraction — the step between WARC ingest and
every text-quality operator in a web-corpus pipeline.

A real tokenizer (state machine over TEXT / TAG / RAWTEXT / COMMENT
states), not a regex strip: the fixture law plants the inputs that
break `<[^>]*>`-style extraction — a `>` inside a QUOTED attribute
value, `<script>`/`<style>` bodies containing tag-shaped text that
must vanish entirely, comments hiding markup, and entities that must
decode in text but NOT in attribute values. Python is the right tool
for a character state machine, so this is Arrow-batched mapInPandas
over one corpus scan (the multimodal-decode convention); the extracted
text is pinned cross-engine by the shared char-fold hash against a
DuckDB oracle that rebuilds the expected VISIBLE text from the
synthesis law, fully independent of the tokenizer.

Reference parity: the reference indexes raw text files
(Search.cpp:183-205) — HTML extraction is tier-2 engine-extension
surface like the rest of the text-pipeline family (O-24).

Link density (visible chars inside <a> / total visible chars) is the
classic boilerplate signal (Kohlschütter et al., "Boilerplate
Detection using Shallow Text Features", WSDM 2010) — emitted as an
exact integer percentage so the oracle comparison is bit-stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_RAWTEXT_TAGS = ("script", "style")


def _decode_entity(s: str, i: int) -> tuple[str, int]:
    """Decode the entity starting at s[i] == '&'. Returns (text, next_i);
    an unterminated or unknown entity is emitted literally (the lenient
    browser behavior)."""
    end = s.find(";", i + 1, i + 12)
    if end < 0:
        return "&", i + 1
    body = s[i + 1 : end]
    if body.startswith("#") and body[1:].isdigit():
        return chr(int(body[1:])), end + 1
    if body in _ENTITIES:
        return _ENTITIES[body], end + 1
    return "&", i + 1


def _collapse(s: str) -> str:
    return " ".join(s.split())


def extract_html_text(html: str) -> tuple[str, int, int, int]:
    """Tokenize `html` and return (visible_text, link_chars, n_paragraphs,
    n_tags): visible text whitespace-collapsed with tags acting as word
    boundaries, entities decoded in text only; link_chars counts the
    collapsed visible chars inside <a> elements; n_paragraphs counts
    <p> opens; n_tags counts all open tags (not closers/comments)."""
    out: list[str] = []
    link: list[str] = []
    low = html.lower()
    i, n = 0, len(html)
    a_depth = 0
    n_para = 0
    n_tags = 0
    while i < n:
        ch = html[i]
        if ch == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                i = n if end < 0 else end + 3
                out.append(" ")
                continue
            # parse the tag, honoring quoted attribute values
            j = i + 1
            quote = ""
            while j < n:
                c = html[j]
                if quote:
                    if c == quote:
                        quote = ""
                elif c in "\"'":
                    quote = c
                elif c == ">":
                    break
                j += 1
            tag = html[i + 1 : j]
            i = j + 1 if j < n else n
            out.append(" ")
            if a_depth:
                link.append(" ")
            name = tag.split()[0].lower() if tag.split() else ""
            if name.startswith("/"):
                if name[1:] == "a" and a_depth:
                    a_depth -= 1
                continue
            n_tags += 1
            if name == "a":
                a_depth += 1
            elif name == "p":
                n_para += 1
            elif name in _RAWTEXT_TAGS:
                # the closer must be a complete tag name — '</scripty>'
                # does not end a <script> body, so require the char after
                # the name to terminate the tag (browser rawtext rule)
                end = low.find("</" + name, i)
                while end >= 0:
                    after = end + 2 + len(name)
                    if after >= n or low[after] in "> \t\n\r\f/":
                        break
                    end = low.find("</" + name, end + 1)
                if end < 0:
                    i = n
                else:
                    close = html.find(">", end)
                    i = n if close < 0 else close + 1
                out.append(" ")
        elif ch == "&":
            text, i = _decode_entity(html, i)
            out.append(text)
            if a_depth:
                link.append(text)
        else:
            out.append(ch)
            if a_depth:
                link.append(ch)
            i += 1
    return _collapse("".join(out)), len(_collapse("".join(link))), n_para, n_tags


def html_text_features(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Arrow-batched extraction: (doc_id, text_chars, text_hash,
    link_chars, link_density_pct, n_paragraphs) per document. One scan,
    nothing shuffles; the html payload never leaves the scan stage."""
    from mapreduce__spark.sources.archives import charfold_hash

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "text_chars": [], "text_hash": [],
                "link_chars": [], "link_density_pct": [], "n_paragraphs": [],
            }
            for i, html in zip(pdf["doc_id"], pdf[html_col]):
                text, link_chars, n_para, _ = extract_html_text(str(html))
                out["doc_id"].append(int(i))
                out["text_chars"].append(len(text))
                out["text_hash"].append(charfold_hash(text))
                out["link_chars"].append(link_chars)
                out["link_density_pct"].append(
                    (100 * link_chars) // len(text) if text else 0
                )
                out["n_paragraphs"].append(n_para)
            yield pd.DataFrame(out)

    return df.select("doc_id", html_col).mapInPandas(
        gen,
        schema=(
            "doc_id bigint, text_chars bigint, text_hash bigint, "
            "link_chars bigint, link_density_pct bigint, n_paragraphs bigint"
        ),
    )
