# textnorm_zh + error_rate_zh behavior tests.

from touchnet_tpu.bin.error_rate_zh import align, score_pairs, tokenize_mixed
from touchnet_tpu.bin.textnorm_zh import normalize, number_to_hanzi


def test_number_to_hanzi():
    assert number_to_hanzi("0") == "零"
    assert number_to_hanzi("7") == "七"
    assert number_to_hanzi("10") == "十"
    assert number_to_hanzi("14") == "十四"
    assert number_to_hanzi("105") == "一百零五"
    assert number_to_hanzi("1234") == "一千二百三十四"
    assert number_to_hanzi("10000") == "一万"
    assert number_to_hanzi("100050") == "十万零五十"
    assert number_to_hanzi("3.14") == "三点一四"
    assert number_to_hanzi("-5") == "负五"


def test_normalize():
    assert normalize("今天３月5日，天气好！") == "今天三月五日 天气好"
    assert normalize("增长了20%") == "增长了百分之二十"
    assert normalize("2024年") == "二零二四年"
    assert normalize("嗯我知道了") == "我知道了"
    assert normalize("hello world") == "HELLO WORLD"
    # erhua: non-lexical removed, lexical kept
    assert normalize("一会儿见") == "一会见"
    assert normalize("我的女儿") == "我的女儿"


def test_tokenize_mixed():
    assert tokenize_mixed("你好world再见") == ["你", "好", "world", "再", "见"]
    assert tokenize_mixed("ABC 123") == ["ABC", "123"]


def test_align_counts():
    hits, subs, dels, ins, ops = align(list("今天天气"), list("今天气"))
    assert (hits, subs, dels, ins) == (3, 0, 1, 0)
    hits, subs, dels, ins, _ = align(list("abc"), list("axcd"))
    assert (hits, subs, dels, ins) == (2, 1, 0, 1)


def test_score_pairs():
    pairs = [
        ("u1", "今天天气好", "今天天气好"),
        ("u2", "今天天气好", "今天气好了"),
    ]
    wer, total = score_pairs(pairs)
    # u2: ref 5 tokens, 1 del (天), 1 ins (了) => 2 errors / 10 total = 20%
    assert abs(wer - 20.0) < 1e-6
    assert total["ref_len"] == 10
