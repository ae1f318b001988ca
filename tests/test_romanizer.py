"""RuleRomanizer (uroman analog, string.py:135-155): per-script unit tests +
the e2e check VERDICT r1 #7 asks for — a non-Latin surface retrieves its
Latin KB alias through the ("exact", "translit") blocking probe."""

import pyarrow as pa

from hamerkop_ray.functions.translit import RuleRomanizer


def test_geez_romanization():
    r = RuleRomanizer()
    assert r.translate("ሰላም", "amh") == "selam"
    assert r.translate("አዲስ አበባ", "amh") == "adis abeba"
    assert r.translate("እስራኤል", "tir") == "israel"


def test_arabic_romanization():
    r = RuleRomanizer()
    assert r.translate("بغداد", "ara") == "bghdad"
    assert r.translate("محمد", "ara") == "mhmd"
    # harakat (short-vowel diacritics) are dropped
    assert r.translate("مُحَمَّد", "ara") == "mhmd"


def test_sinhala_romanization():
    r = RuleRomanizer()
    assert r.translate("කොළඹ", "sin") == "kolamba"


def test_odia_romanization():
    r = RuleRomanizer()
    assert r.translate("ଭୁବନେଶ୍ୱର", "ori") == "bhubaneshwara"


def test_devanagari_romanization():
    r = RuleRomanizer()
    assert r.translate("दिल्ली", "hin") == "dillii"


def test_cyrillic_romanization():
    r = RuleRomanizer()
    assert r.translate("Владимир Петров", "rus") == "Vladimir Petrov"
    assert r.translate("Київ", "ukr") == "Kiyiv"
    assert r.translate("Ђоковић", "srp") == "Djokovic"
    assert r.translate("Хабаровск", "rus") == "Khabarovsk"


def test_greek_romanization():
    r = RuleRomanizer()
    assert r.translate("Αλέξανδρος", "ell") == "Alexandros"
    assert r.translate("Αθήνα", "ell") == "Athina"


def test_hebrew_romanization():
    r = RuleRomanizer()
    assert r.translate("ירושלים", "heb") == "yrvshlym"
    # niqqud are dropped
    assert r.translate("שָׁלוֹם", "heb") == "shlvm"


def test_hangul_romanization():
    r = RuleRomanizer()
    assert r.translate("서울", "kor") == "seoul"
    assert r.translate("평양", "kor") == "pyeongyang"
    assert r.translate("김정은", "kor") == "gimjeongeun"


def test_kana_romanization():
    r = RuleRomanizer()
    assert r.translate("とうきょう", "jpn") == "toukyou"
    assert r.translate("トヨタ", "jpn") == "toyota"
    assert r.translate("きょうと", "jpn") == "kyouto"
    assert r.translate("さっぽろ", "jpn") == "sapporo"   # sokuon doubles
    assert r.translate("コーヒー", "jpn") == "koohii"    # long-vowel mark
    assert r.translate("まっちゃ", "jpn") == "matcha"    # っち → tch


def test_uroman_gating():
    r = RuleRomanizer()
    assert r.translate("plain ascii", "und") is None  # nothing to project
    assert r.translate("München", "eng") is None      # English skipped
    assert r.translate("München", "deu") == "Munchen"  # accent strip


def test_translit_probe_retrieves_latin_alias():
    """e2e: Amharic surface 'አዲስ አበባ' romanizes to 'adis abeba', which hits
    the KB's Latin alias via the ("exact","translit") generator — the probe
    that was a no-op for Ge'ez before round 2."""
    from hamerkop_ray.schemas import DOCUMENTS
    from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
    from hamerkop_ray.stages.chains import Stage1Chains
    from hamerkop_ray.stages.preprocess import (
        cascade,
        default_cascade,
        name_projector,
    )

    kb = pa.Table.from_pylist(
        [
            {"entity_id": "E1", "entity_type": "GPE",
             "names": ["Addis Ababa", "Adis Abeba"]},
            {"entity_id": "E2", "entity_type": "GPE", "names": ["Asmara"]},
        ]
    )
    doc = pa.Table.from_pylist(
        [{
            "doc_id": "D_NW_1",
            "spans": [
                {"kind": "token", "text": "ሰላም", "media_ref": "", "offset": 1},
                {"kind": "mention/GPE", "text": "አዲስ አበባ", "media_ref": "", "offset": 5},
            ],
        }],
        schema=DOCUMENTS,
    )
    from hamerkop_ray.functions.langid import NgramLangDetector

    pre = cascade([default_cascade(), name_projector(RuleRomanizer().translate)])
    rows = Stage1Chains(
        preprocessor=pre, lang_detector=NgramLangDetector()
    ).chain_rows(doc)
    assert len(rows) == 1
    assert rows[0]["lang"] == "tir"  # Ge'ez script detected
    assert rows[0]["translit"] == "adis abeba"

    gen = CandidateGeneration(
        NameIndexData(kb), config=[("exact", "translit")], maximum=25
    )
    out = gen.add_candidates(rows)
    assert [c["entity_id"] for c in out[0]["candidates"]] == ["E1"]


def test_translit_probe_cyrillic_surface():
    """e2e (VERDICT r2 #7): a Cyrillic surface 'Минск' romanizes to 'Minsk'
    and retrieves the Latin KB alias via the ("exact","translit") probe."""
    from hamerkop_ray.schemas import DOCUMENTS
    from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
    from hamerkop_ray.stages.chains import Stage1Chains
    from hamerkop_ray.stages.preprocess import (
        cascade,
        default_cascade,
        name_projector,
    )
    from hamerkop_ray.functions.langid import NgramLangDetector

    kb = pa.Table.from_pylist(
        [
            {"entity_id": "E1", "entity_type": "GPE", "names": ["Minsk"]},
            {"entity_id": "E2", "entity_type": "GPE", "names": ["Pinsk"]},
        ]
    )
    doc = pa.Table.from_pylist(
        [{
            "doc_id": "D_NW_2",
            "spans": [
                {"kind": "mention/GPE", "text": "Минск", "media_ref": "", "offset": 0},
            ],
        }],
        schema=DOCUMENTS,
    )
    pre = cascade([default_cascade(), name_projector(RuleRomanizer().translate)])
    rows = Stage1Chains(
        preprocessor=pre, lang_detector=NgramLangDetector()
    ).chain_rows(doc)
    assert len(rows) == 1
    assert rows[0]["translit"] == "Minsk"

    gen = CandidateGeneration(
        NameIndexData(kb), config=[("exact", "translit")], maximum=25
    )
    out = gen.add_candidates(rows)
    assert [c["entity_id"] for c in out[0]["candidates"]] == ["E1"]


def test_georgian_armenian_thai_lao():
    r = RuleRomanizer()
    assert r.translate("საქართველო") == "sakartvelo"   # Georgia
    assert r.translate("თბილისი") == "tbilisi"
    assert r.translate("Հայաստան") == "Hayastan"        # Armenia (case kept)
    assert r.translate("երեւան") == "erewan"            # classical yiwn = w
    assert r.translate("և") == "ev"                     # ech-yiwn ligature
    assert r.translate("กรุงเทพ") == "krungtheph"        # preposed เ reordered
    assert r.translate("ວຽງຈັນ") == "wiangchan"          # Lao (aligned block)


def test_hanzi_frequent_subset():
    r = RuleRomanizer()
    assert r.translate("北京") == "beijing"
    assert r.translate("上海") == "shanghai"
    assert r.translate("毛泽东") == "maozedong"
    assert r.translate("中华人民共和国") == "zhonghuarenmingongheguo"
    # rare hanzi: honest passthrough (no fake readings)
    assert r.translate("魑魅魍魉") is None


def test_hanzi_extended_subset_round4():
    """Round-4 breadth (VERDICT r3 #6): surnames, given names, numerals,
    institutions, country phonetics."""
    r = RuleRomanizer()
    assert r.translate("鄧小平") == "dengxiaoping"
    assert r.translate("習近平") == "xijinping"
    assert r.translate("张伟") == "zhangwei"
    assert r.translate("王芳") == "wangfang"
    assert r.translate("孙丽") == "sunli"
    assert r.translate("北京大学") == "beijingdaxue"
    assert r.translate("中国银行") == "zhongguoyin行"  # 行 polyphone: no fake reading
    assert r.translate("一二三四五") == "yiersansiwu"
    assert r.translate("毛泽东思想") == "maozedongsixiang"


def test_mixed_kana_hanzi_script():
    """Mixed Japanese script: kanji via the pinyin table (uroman also reads
    Han ideographs with Mandarin readings), kana via Hepburn — one string."""
    r = RuleRomanizer()
    assert r.translate("東京タワー") == "dongjingtawaa"
    assert r.translate("ソニー") == "sonii"
    assert r.translate("大阪カジノ") == "daban kajino".replace(" ", "")


def test_translit_probe_zh_surface_recall():
    """Synthetic zh corpus: every Chinese GPE/PER surface built from the
    frequent-hanzi table must retrieve its Latin KB alias via the
    ("exact","translit") probe — non-zero (here: total) candidate recall."""
    from hamerkop_ray.functions.langid import NgramLangDetector
    from hamerkop_ray.schemas import DOCUMENTS
    from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
    from hamerkop_ray.stages.chains import Stage1Chains
    from hamerkop_ray.stages.preprocess import (
        cascade,
        default_cascade,
        name_projector,
    )

    surfaces = [
        ("北京", "beijing", "GPE"),
        ("上海", "shanghai", "GPE"),
        ("重庆", "chongqing", "GPE"),
        ("深圳", "shenzhen", "GPE"),
        ("鄧小平", "dengxiaoping", "PER"),
        ("毛泽东", "maozedong", "PER"),
        ("张伟", "zhangwei", "PER"),
    ]
    kb = pa.Table.from_pylist(
        [
            {"entity_id": f"E{i}", "entity_type": et, "names": [latin]}
            for i, (_, latin, et) in enumerate(surfaces)
        ]
    )
    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": f"D_NW_{i}",
                "spans": [
                    {"kind": f"mention/{et}", "text": zh,
                     "media_ref": "", "offset": 1},
                ],
            }
            for i, (zh, _latin, et) in enumerate(surfaces)
        ],
        schema=DOCUMENTS,
    )
    pre = cascade([default_cascade(), name_projector(RuleRomanizer().translate)])
    rows = Stage1Chains(
        preprocessor=pre, lang_detector=NgramLangDetector()
    ).chain_rows(docs)
    assert len(rows) == len(surfaces)

    gen = CandidateGeneration(
        NameIndexData(kb), config=[("exact", "translit")], maximum=25
    )
    out = gen.add_candidates(rows)
    hits = sum(
        1 for i, row in enumerate(sorted(out, key=lambda r: r["doc_id"]))
        if f"E{i}" in {c["entity_id"] for c in row["candidates"]}
    )
    recall = hits / len(surfaces)
    assert recall == 1.0


def test_hanzi_long_tail_round5():
    """Round-5 long-tail depth (VERDICT r4 #6): provincial-capital toponyms,
    remaining Baijiaxing surnames, org vocabulary, given-name chars — every
    character here is OUTSIDE the round-3/4 tables."""
    r = RuleRomanizer()
    assert r.translate("洛阳") == "luoyang"
    assert r.translate("哈尔滨") == "haerbin"
    assert r.translate("沈阳") == "shenyang"
    assert r.translate("太原") == "taiyuan"
    assert r.translate("魏晓宏") == "weixiaohong"
    assert r.translate("孔祥瑞") == "kongxiangrui"
    assert r.translate("农业部") == "nongyebu"
    assert r.translate("工商局") == "gongshangju"
    # fixed-compound reading for a single-char polyphone (柏 bai/bo)
    assert r.translate("柏林") == "bolin"
    # polyphone-exclusion policy still holds for ambiguous singles
    assert r.translate("中国银行") == "zhongguoyin行"
    assert r.translate("音乐") == "yin乐"  # 乐 le/yue: passthrough


def test_translit_probe_zh_long_tail_recall():
    """Out-of-round-4-table zh surfaces (the characters the round-5 block
    added) must retrieve their Latin KB alias via the translit probe —
    the VERDICT r4 #6 done-criterion."""
    from hamerkop_ray.functions.langid import NgramLangDetector
    from hamerkop_ray.schemas import DOCUMENTS
    from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
    from hamerkop_ray.stages.chains import Stage1Chains
    from hamerkop_ray.stages.preprocess import (
        cascade,
        default_cascade,
        name_projector,
    )

    surfaces = [
        ("洛阳", "luoyang", "GPE"),
        ("哈尔滨", "haerbin", "GPE"),
        ("沈阳", "shenyang", "GPE"),
        ("魏晓宏", "weixiaohong", "PER"),
        ("孔祥瑞", "kongxiangrui", "PER"),
        ("陶毅", "taoyi", "PER"),
    ]
    kb = pa.Table.from_pylist(
        [
            {"entity_id": f"E{i}", "entity_type": et, "names": [latin]}
            for i, (_, latin, et) in enumerate(surfaces)
        ]
    )
    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": f"D_NW_{i}",
                "spans": [
                    {"kind": f"mention/{et}", "text": zh,
                     "media_ref": "", "offset": 1},
                ],
            }
            for i, (zh, _latin, et) in enumerate(surfaces)
        ],
        schema=DOCUMENTS,
    )
    pre = cascade([default_cascade(), name_projector(RuleRomanizer().translate)])
    rows = Stage1Chains(
        preprocessor=pre, lang_detector=NgramLangDetector()
    ).chain_rows(docs)
    assert len(rows) == len(surfaces)

    gen = CandidateGeneration(
        NameIndexData(kb), config=[("exact", "translit")], maximum=25
    )
    out = gen.add_candidates(rows)
    hits = sum(
        1 for i, row in enumerate(sorted(out, key=lambda r: r["doc_id"]))
        if f"E{i}" in {c["entity_id"] for c in row["candidates"]}
    )
    assert hits == len(surfaces)
