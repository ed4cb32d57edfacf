"""Convert-and-tag preprocessing pipeline.

The reference lets foreign file formats be indexed by chaining two
pluggable per-file steps in front of a DocIndexer (ConvertPlugin.java:12-64
— e.g. docx/epub/html -> a taggable text format — and TagPlugin.java:11-47
— plain text -> an annotated format a DocIndexer accepts), resolved and
wired by PluginManager (index/PluginManager.java) from the `plugins`
config. The reference implementations shell out to external tools
(convert-and-tag/: ConvertPluginOpenConvert, TagPluginDutchTagger).

Here each plugin is a plain Python callable shipped to executors: the
whole pipeline (convert -> tag -> parse) runs inside ONE distributed
mapInPandas pass over whole files — no driver-side file handling, no temp
files, and the converted/tagged text never round-trips through the
driver. Any `pages_from_*_dir` reader composes: they all accept a
(url, value) files DataFrame in place of a directory path.

External-tool plugins (OpenConvert jar, DutchTagger models) are not
runnable in this sandbox; `convert_openconvert` / `tag_dutchtagger`
are registered as honestly-failing stubs with the real plugin interface,
mirroring how the reference fails when the plugin jar is unconfigured.
Deterministic pure-Python plugins (`convert_html`, `tag_suffix_rules`)
make the full chain real and testable end-to-end.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ConvertPlugin:
    """ConvertPlugin.java:12-64 parity: foreign format -> taggable text.

    perform(content, input_format) -> converted content. input_formats is
    descriptive (extensions/format names, like getInputFormats());
    output_format must match some TagPlugin.input_format (or a reader)."""

    name: str
    input_formats: frozenset
    output_format: str
    perform: Callable[[str, str], str]

    def can_convert(self, input_format: str) -> bool:
        return input_format.lower().lstrip(".") in self.input_formats


@dataclass(frozen=True)
class TagPlugin:
    """TagPlugin.java:11-47 parity: taggable text -> annotated format.

    output_format_id names the pages_from_* reader format the tagged
    output parses with (getOutputFormatIdentifier); output_file_name
    mirrors getOutputFileName (DocIndexers key on extensions; our readers
    don't, so it's informational)."""

    name: str
    input_format: str
    output_format_id: str
    perform: Callable[[str], str]
    output_file_name: Callable[[str], str] = field(
        default=lambda n: n + ".tagged"
    )


_CONVERT: dict[str, ConvertPlugin] = {}
_TAG: dict[str, TagPlugin] = {}


def register_convert_plugin(p: ConvertPlugin) -> ConvertPlugin:
    _CONVERT[p.name] = p
    return p


def register_tag_plugin(p: TagPlugin) -> TagPlugin:
    _TAG[p.name] = p
    return p


def resolve_pipeline(
    input_format: str,
) -> tuple[ConvertPlugin | None, TagPlugin | None]:
    """PluginManager-style resolution: a TagPlugin that accepts the input
    format directly needs no converter; otherwise pick the first
    ConvertPlugin accepting the input whose output some TagPlugin accepts
    (ConvertPlugin.getOutputFormat 'must match a format accepted by a
    TagPlugin')."""
    fmt = input_format.lower().lstrip(".")
    for t in _TAG.values():
        if t.input_format == fmt:
            return None, t
    for c in _CONVERT.values():
        if c.can_convert(fmt):
            for t in _TAG.values():
                if t.input_format == c.output_format:
                    return c, t
            return c, None
    raise ValueError(
        f"no convert/tag pipeline accepts input format {input_format!r} "
        f"(converters: {sorted(_CONVERT)}, taggers: {sorted(_TAG)})"
    )


def preprocess_files(
    spark: SparkSession,
    path,
    input_format: str,
    convert: ConvertPlugin | str | None = None,
    tag: TagPlugin | str | None = None,
) -> DataFrame:
    """Whole files -> (url, value) with convert+tag applied per file,
    distributed. Pass the result as the `path` of any pages_from_*_dir
    reader. convert/tag default to resolve_pipeline(input_format); pass
    explicit plugins (or registry names) to pin the chain."""
    from .sources import _wholefile_reader

    if convert is None and tag is None:
        convert, tag = resolve_pipeline(input_format)
    if isinstance(convert, str):
        convert = _CONVERT[convert]
    if isinstance(tag, str):
        tag = _TAG[tag]
    conv_fn = convert.perform if convert else None
    tag_fn = tag.perform if tag else None
    rename = tag.output_file_name if tag else (lambda n: n)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            vals, urls = [], []
            for fname, content in zip(pdf["url"], pdf["value"]):
                c = content or ""
                if conv_fn:
                    c = conv_fn(c, input_format)
                if tag_fn:
                    c = tag_fn(c)
                vals.append(c)
                urls.append(rename(fname))
            yield pd.DataFrame({"value": vals, "url": urls})

    return _wholefile_reader(spark, path).mapInPandas(
        run, schema="value string, url string"
    )


def pages_via_convert_and_tag(
    spark: SparkSession,
    path,
    input_format: str,
    convert: ConvertPlugin | str | None = None,
    tag: TagPlugin | str | None = None,
    **reader_kwargs,
) -> DataFrame:
    """Full chain: preprocess (convert -> tag) then parse with the reader
    the TagPlugin's output_format_id names. Returns a pages DataFrame
    ready for build_index."""
    from . import sources

    files = preprocess_files(spark, path, input_format, convert, tag)
    if isinstance(tag, str):
        tag = _TAG[tag]
    if tag is None:
        _, tag = resolve_pipeline(input_format)
    readers = {
        "tabular": sources.pages_from_tabular_dir,
        "folia": sources.pages_from_folia_dir,
        "conllu": sources.pages_from_conllu,
        "txt": sources.pages_from_text_dir,
    }
    reader = readers.get(tag.output_format_id)
    if reader is None:
        raise ValueError(
            f"tag plugin {tag.name!r} outputs {tag.output_format_id!r}, "
            f"no registered reader (have: {sorted(readers)})"
        )
    return reader(spark, files, **reader_kwargs)


# ---------------------------------------------------------------- builtins --

_TAG_STRIP = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAGS = re.compile(r"<[^>]+>")
_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'",
        "&apos;": "'", "&nbsp;": " "}


def _html_to_text(content: str, _fmt: str) -> str:
    """Deterministic html/xhtml -> plain text (the OpenConvert 'html'
    input path, minus the external jar): drop script/style subtrees,
    strip tags, fold entities, collapse whitespace per line."""
    c = _TAG_STRIP.sub(" ", content)
    c = re.sub(r"<(p|div|br|li|h[1-6]|tr)\b", r"\n<\1", c, flags=re.IGNORECASE)
    c = _TAGS.sub(" ", c)
    for k, v in _ENT.items():
        c = c.replace(k, v)
    lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in c.splitlines()]
    return "\n".join(ln for ln in lines if ln)


convert_html = register_convert_plugin(
    ConvertPlugin(
        name="convert_html",
        input_formats=frozenset({"html", "xhtml", "htm"}),
        output_format="txt",
        perform=_html_to_text,
    )
)


_WORD_RE = re.compile(r"\w+(?:['-]\w+)*|[^\w\s]", re.UNICODE)
_SUFFIX_POS = (
    ("ing", "VERB"), ("ed", "VERB"), ("ly", "ADV"), ("ness", "NOUN"),
    ("tion", "NOUN"), ("s", "NOUN"),
)


def _suffix_tag(content: str) -> str:
    """Deterministic rule tagger: text -> the tabular TSV format
    (word/lemma/pos columns, blank line per sentence). Stands in for the
    reference's external DutchTagger so the tag stage is real and
    testable; the lemma strips the matched suffix, pos falls back to
    PUNCT/NOUN. Sentence breaks on ./!/? tokens."""
    out = ["word\tlemma\tpos"]
    n_in_sent = 0
    for w in _WORD_RE.findall(content):
        if not w.strip():
            continue
        lw = w.lower()
        if not any(ch.isalnum() for ch in w):
            out.append(f"{w}\t{w}\tPUNCT")
            if w in ".!?" and n_in_sent:
                out.append("")
                n_in_sent = 0
            continue
        lemma, pos = lw, "NOUN"
        for suf, p in _SUFFIX_POS:
            if lw.endswith(suf) and len(lw) > len(suf) + 2:
                lemma, pos = lw[: -len(suf)], p
                break
        out.append(f"{w}\t{lemma}\t{pos}")
        n_in_sent += 1
    return "\n".join(out) + "\n"


tag_suffix_rules = register_tag_plugin(
    TagPlugin(
        name="tag_suffix_rules",
        input_format="txt",
        output_format_id="tabular",
        perform=_suffix_tag,
        output_file_name=lambda n: n + ".tsv",
    )
)


def _noop_tag(content: str) -> str:
    return content


tag_noop = register_tag_plugin(
    TagPlugin(
        name="tag_noop",
        input_format="txt-pretagged",
        output_format_id="txt",
        perform=_noop_tag,
        output_file_name=lambda n: n,
    )
)
"""TagPluginNoop.java parity: passthrough for input that is already in an
indexable format."""


def _external_tool_stub(tool: str):
    def perform(*_a, **_k):
        raise NotImplementedError(
            f"{tool} requires an external tool not present in this "
            "environment; register a ConvertPlugin/TagPlugin wrapping "
            "your own binary (reference: convert-and-tag/ "
            "ConvertPluginOpenConvert.java / TagPluginDutchTagger.java)"
        )

    return perform


convert_openconvert = register_convert_plugin(
    ConvertPlugin(
        name="convert_openconvert",
        input_formats=frozenset({"doc", "docx", "epub", "rtf"}),
        output_format="tei",
        perform=_external_tool_stub("OpenConvert"),
    )
)

tag_dutchtagger = register_tag_plugin(
    TagPlugin(
        name="tag_dutchtagger",
        input_format="tei",
        output_format_id="folia",
        perform=_external_tool_stub("DutchTagger"),
    )
)
