import pandas as pd

from blacklab_spark.fixtures import pages_pdf
from blacklab_spark.tokenize import (
    extract_text_one,
    extract_text_series,
    fold_series,
    fold_token,
    tokenize_one,
)


def test_extract_prefers_text():
    assert extract_text_one(b"<p>from html</p>", "from text") == "from text"


def test_extract_html_fallback_strips_tags():
    html = b"<html><head><title>t</title><script>var x=1;</script></head><body><p>Hello <b>world</b></p><!-- c --></body></html>"
    assert extract_text_one(html, None) == "t Hello world"


def test_extract_byte_identity_per_url():
    """north-rule invariant: extraction is deterministic and identical between
    the batch (Series) path and the scalar path for every row."""
    pages = pages_pdf("small", 300)
    batch = extract_text_series(pages["html"], pages["text"])
    for i in range(len(pages)):
        one = extract_text_one(pages["html"][i], pages["text"][i])
        assert one.encode() == batch[i].encode(), pages["url"][i]


def test_tokenize_basic():
    assert tokenize_one("The quick-brown fox. 42!") == ["The", "quick", "brown", "fox", "42"]


def test_fold():
    assert fold_token("CAFÉ") == "cafe"
    assert fold_token("Café") == "cafe"
    assert list(fold_series(pd.Series(["CAFÉ", "Über"]))) == ["cafe", "uber"]


def test_empty_doc():
    assert tokenize_one("") == []
