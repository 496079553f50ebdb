"""Unit tests: rule-engine semantics (SURVEY.md §2.4, R1-R9)."""

from crawler_ray.rules import (
    DOUBAN_BOOK,
    DOUBAN_GROUP,
    CompiledRule,
    RuleSpec,
    _atoi,
    compile_task,
)


def test_atoi_strconv_semantics():
    # strconv.Atoi: strict integer grammar, failure → 0 (dobuan_book.go:133)
    assert _atoi("254") == 254
    assert _atoi("-7") == -7
    assert _atoi("+7") == 7
    assert _atoi(" 254") == 0  # Go rejects whitespace, unlike Python int()
    assert _atoi("254 ") == 0
    assert _atoi("12a") == 0
    assert _atoi("") == 0


def test_link_extract_order_and_limit():
    spec = RuleSpec(
        task="t", name="r", kind="link_extract",
        regex=r'<a href="([^"]+)" class="tag">([^<]+)</a>',
        url_prefix="https://x", next_rule="n", per_page_limit=3,
    )
    body = "".join(f'<a href="/t/{i}" class="tag">t{i}</a>' for i in range(5))
    children, item = CompiledRule(spec).extract("u", body, {})
    assert item is None
    # match order preserved, truncated to first 3 (dobuan_book.go:85-90)
    assert [u for u, _ in children] == ["https://x/t/0", "https://x/t/1", "https://x/t/2"]


def test_link_extract_carry():
    spec = RuleSpec(
        task="t", name="r", kind="link_extract",
        regex=r'<a.*?href="([^"]+)" title="([^"]+)"',
        next_rule="n", carry_field="书名",
    )
    body = '<li><a class="x" href="https://b/1" title="Book One"></a></li>'
    children, _ = CompiledRule(spec).extract("u", body, {"old": "v"})
    assert children == [("https://b/1", {"old": "v", "书名": "Book One"})]


def test_predicate_extract():
    spec = RuleSpec(task="t", name="r", kind="predicate_extract",
                    regex=r'<div class="topic-content">[\s\S]*?阳台[\s\S]*?<div')
    r = CompiledRule(spec)
    hit = '<div class="topic-content">x\n阳台 y\n<div>'
    assert r.extract("http://u", hit, {})[1] == {"url": "http://u"}
    assert r.extract("http://u", "<div>nope</div>", {})[1] is None


def test_field_extract_first_match_or_empty_and_carry_merge():
    rules = compile_task(DOUBAN_BOOK)
    body = (
        '<span class="pl"> 作者</span>:\n<a href="/a">张三</a>'
        '<span class="pl">页数:</span> 254<br/>'
        '<span class="pl">定价:</span>69.00元<br/>'
    )
    _, item = rules["book_detail"].extract("u", body, {"书名": "测试"})
    assert item["书名"] == "测试"  # TmpData merge
    assert item["作者"] == "张三"
    assert item["页数"] == 254  # Atoi int
    assert item["价格"] == "69.00元"
    assert item["出版社"] == ""  # first-match-or-empty (ExtraString)
    assert item["得分"] == ""
    assert item["简介"] == ""
    assert list(item.keys()) == list(DOUBAN_BOOK.rules["book_detail"].item_fields)


def test_douban_group_rules_compile():
    rules = compile_task(DOUBAN_GROUP)
    body = 'href="https://www.douban.com/group/topic/abc123/" class="">标题</a>'
    children, _ = rules["group_list"].extract("u", body, {})
    assert children == [("https://www.douban.com/group/topic/abc123/", {})]
