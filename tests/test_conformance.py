"""Conformance corpus: rule regexes vs the reference's golden HTML.

The reference ships three golden input pages (``testhtml/``) that drive its
tag → book-list → book-detail chain via the TestBody injection path
(``collect/request.go:25-26``, ``engine/crawler.go:95-97``). These tests pin
Go-regexp(RE2)-vs-Python ``re`` parity for every shipped rule regex
(SURVEY.md R1-R8): expected values below were verified byte-for-byte against
the raw HTML (grep of the exact match spans), including the
whitespace-preserving captures ('' 8.1 '', '' 48'') that a sloppier port
would trim.

Skipped when the read-only reference checkout is absent.
"""

import os

import pytest

from crawler_ray.rules import DOUBAN_BOOK, DOUBAN_GROUP, compile_task

REF = "/root/reference/testhtml"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus absent")


def _read(name: str) -> str:
    with open(os.path.join(REF, name), encoding="utf-8") as fh:
        return fh.read()


def test_tag_page_r3():
    rules = compile_task(DOUBAN_BOOK)
    children, item = rules["tag"].extract("https://book.douban.com", _read("index.html"), {})
    assert item is None
    # top-3 truncation in match order, prefix-joined (dobuan_book.go:65-91)
    assert [u for u, _ in children] == [
        "https://book.douban.com/tag/小说",
        "https://book.douban.com/tag/随笔",
        "https://book.douban.com/tag/日本文学",
    ]


def test_book_list_page_r4_carry():
    rules = compile_task(DOUBAN_BOOK)
    children, _ = rules["book_list"].extract("u", _read("fiction_tag.html"), {})
    assert [(u, c["书名"]) for u, c in children] == [
        ("https://book.douban.com/subject/35534519/", "素食者"),
        ("https://book.douban.com/subject/36104107/", "长安的荔枝"),
        ("https://book.douban.com/subject/36710597/", "食南之徒"),
    ]


def test_book_detail_page_r5_field_bytes():
    rules = compile_task(DOUBAN_BOOK)
    _, item = rules["book_detail"].extract("u", _read("book_detail.html"), {"书名": "素食者"})
    # exact captured bytes incl. surrounding whitespace (ExtraString semantics)
    assert item == {
        "书名": "素食者",
        "作者": "[韩] 韩江",
        "页数": 208,
        "出版社": "四川文艺出版社",
        "得分": " 8.1 ",
        "价格": " 48",
        "简介": "——美国小说家阿米莉亚·格雷",
    }
    assert isinstance(item["页数"], int)


def test_group_rules_r1_r2_on_detail_corpus():
    """R1/R2 regexes run over the golden pages (no topic links there → empty;
    predicate mismatch → no item): exercises the no-match paths byte-safely."""
    rules = compile_task(DOUBAN_GROUP)
    body = _read("index.html")
    children, _ = rules["group_list"].extract("u", body, {})
    assert children == []
    _, item = rules["sun_room"].extract("http://u", body, {})
    assert item is None
