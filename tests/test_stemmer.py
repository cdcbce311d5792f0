"""Snowball-russian stemmer: conflation groups, invariants, and the
recall effect through a stemmed index."""

import pandas as pd
import pyarrow as pa
import pytest

from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
from hybrid_sanctions_search_engine_ray.functions.analyzer import analyze
from hybrid_sanctions_search_engine_ray.functions.stemmer import stem_ru

# inflection families must conflate to ONE stem each
CONFLATION_GROUPS = [
    ["книга", "книги", "книгу", "книгой"],            # noun, case endings
    ["красивый", "красивая", "красивые", "красивым"],  # adjective
    ["бегал", "бегала", "бегали"],                     # past verb
    ["платеж", "платежа", "платежу"],                  # payment noun
    ["стол", "стола", "столу", "столом"],              # noun, full paradigm
    ["иванова", "ивановым", "ивановой"],               # surname oblique cases
    # NOTE: nominative "иванов" stems further ("ов" is also a genitive-
    # plural noun ending) — a known Snowball property, same as ES russian
    ["делавшись", "делав", "делавши"],                 # perfective gerunds
]


@pytest.mark.parametrize("group", CONFLATION_GROUPS, ids=[g[0] for g in CONFLATION_GROUPS])
def test_conflation_groups(group):
    stems = {stem_ru(w) for w in group}
    assert len(stems) == 1, f"{group} → {stems}"


def test_distinct_words_stay_distinct():
    assert stem_ru("книга") != stem_ru("красивый")
    assert stem_ru("иванов") != stem_ru("петров")


def test_non_cyrillic_untouched():
    for w in ["spark", "join", "x1", "", "123"]:
        assert stem_ru(w) == w


def test_yo_folded():
    assert stem_ru("ёжика") == stem_ru("ежика")


def test_short_words_survive():
    # words with no vowel / single letters must not be mangled to empty
    for w in ["в", "к", "с", "мгл"]:
        assert stem_ru(w) != ""


def test_analyzer_integration():
    cfg = AnalyzerConfig(mode="full", stem="ru")
    assert analyze("Книги Иванова", cfg) == [stem_ru("книги"), stem_ru("иванова")]
    # latin text unaffected by the ru stemmer
    assert analyze("Spark JOIN", cfg) == ["spark", "join"]


def test_stemmed_index_recall(ray_session, tmp_path):
    """A query in a different inflection than the document must match
    once stemming is on (the morphology recall lever), and the manifest
    round-trips the stem setting into the query path."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    texts = ["иванов купил книги", "петров продал дом", "unrelated latin text"]
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(texts)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    cfg = EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="full", stem="ru"))
    idx = str(tmp_path / "stemidx")
    m = build_index("mem", idx, cfg, transcripts_ds=ds)
    assert m.stem == "ru"
    r = IndexReader(idx)
    docs, _ = r.search_one("книгу иванова", 3)   # different case forms
    assert docs.size and int(docs[0]) == 0


# --- Ukrainian ---------------------------------------------------------------

from hybrid_sanctions_search_engine_ray.functions.stemmer import stem_uk  # noqa: E402

# inflection families must conflate to ONE stem each (oblique-form groups,
# same convention as the ru suite: some nominatives strip further — a known
# Porter/Snowball property, e.g. світлана → світла like ru светлана)
UK_CONFLATION_GROUPS = [
    ["книги", "книгу", "книгою"],                      # noun, case endings
    ["світлани", "світлані", "світлану"],              # given name, oblique
    ["ковальський", "ковальського", "ковальському"],   # -ський surname
    ["читати", "читала", "читали", "читаємо"],         # verb paradigm
    ["зробив", "зробила", "зробили", "зробивши"],      # past + gerund
    ["новий", "нова", "нові", "новіший"],              # adjective + comparative
    ["столи", "стола", "столу", "столів", "столами"],  # noun, full paradigm
    ["олена", "олени", "олені"],                       # given name
    ["шевченко", "шевченка", "шевченку"],              # -ко surname
    ["люди", "людина", "людини", "людей"],             # suppletive (exception table)
    ["діти", "дитина", "дітей"],                       # suppletive (exception table)
]


@pytest.mark.parametrize("group", UK_CONFLATION_GROUPS, ids=[g[0] for g in UK_CONFLATION_GROUPS])
def test_uk_conflation_groups(group):
    stems = {stem_uk(w) for w in group}
    assert len(stems) == 1, f"{group} → {stems}"


def test_uk_distinct_words_stay_distinct():
    assert stem_uk("книга") != stem_uk("новий")
    assert stem_uk("шевченко") != stem_uk("ковальський")


def test_uk_non_cyrillic_untouched():
    for w in ["spark", "join", "x1", "", "123"]:
        assert stem_uk(w) == w


def test_uk_specific_letters_accepted():
    # і/ї/є-initial words must reach the stemmer (outside the а-я range)
    assert stem_uk("іграшки") == stem_uk("іграшку")
    assert stem_uk("їжаки") == stem_uk("їжака")


def test_uk_short_words_survive():
    for w in ["в", "з", "як", "мгл"]:
        assert stem_uk(w) != ""


def test_ru_suppletive_exceptions():
    from hybrid_sanctions_search_engine_ray.functions.stemmer import stem_ru as _ru

    assert _ru("люди") == _ru("человека") == _ru("людям")
    assert _ru("дети") == _ru("ребенка") == _ru("детям")


def test_uk_analyzer_integration():
    cfg = AnalyzerConfig(mode="full", stem="uk")
    assert analyze("Книги Олени", cfg) == [stem_uk("книги"), stem_uk("олени")]
    assert analyze("Spark JOIN", cfg) == ["spark", "join"]


def test_uk_stemmed_index_recall(ray_session, tmp_path):
    """uk query in a different inflection than the document must match
    with stem="uk" on, and the manifest round-trips the setting."""
    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    texts = ["олена купила книги", "петро продав дім", "unrelated latin text"]
    rows = [
        {"conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": "", "ts": pd.Timestamp(2026, 1, 1), "doc_id": i}
        for i, t in enumerate(texts)
    ]
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False))
    cfg = EngineConfig(num_partitions=4, analyzer=AnalyzerConfig(mode="full", stem="uk"))
    idx = str(tmp_path / "ukstemidx")
    m = build_index("mem", idx, cfg, transcripts_ds=ds)
    assert m.stem == "uk"
    r = IndexReader(idx)
    docs, _ = r.search_one("книгу олені", 3)     # different case forms
    assert docs.size and int(docs[0]) == 0


# --- name-field diminutive conflation --------------------------------------


def test_name_stem_table_values_are_canonical_stems():
    """Every _DIMINUTIVE_* value must be reachable as the Snowball stem
    of the canonical full name — the consistency contract that makes
    diminutive and full-name inflections meet at one stem."""
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        _DIMINUTIVE_RU,
        _DIMINUTIVE_UK,
        stem_ru,
        stem_uk,
    )

    canon_ru = {
        "александр": "александра", "владимир": "владимира",
        "дмитр": "дмитрия", "никола": "николай", "петр": "петра",
        "миха": "михаила", "евген": "евгения", "екатерин": "екатерина",
        "ел": "елена", "натал": "наталья", "мар": "мария",
        "серг": "сергей", "татья": "татьяна", "ива": "иван",
        "павел": "павел", "алекс": "алексей", "андр": "андрей",
        "константин": "константин", "людм": "людмила",
        "светла": "светлана",
    }
    for stem_val in set(_DIMINUTIVE_RU.values()):
        assert stem_val in canon_ru, stem_val
        assert stem_ru(canon_ru[stem_val]) == stem_val

    canon_uk = {
        "олександр": "олександра", "володимир": "володимира",
        "дмитр": "дмитро", "микол": "микола", "петр": "петро",
        "михайл": "михайло", "євген": "євгена", "катерин": "катерина",
        "олен": "олена", "наталі": "наталія", "марі": "марія",
        "серг": "сергій", "тетя": "тетяна", "іва": "іван",
        "васил": "василь", "павл": "павло", "андр": "андрій",
    }
    for stem_val in set(_DIMINUTIVE_UK.values()):
        assert stem_val in canon_uk, stem_val
        assert stem_uk(canon_uk[stem_val]) == stem_val


def test_name_stem_conflates_diminutive_inflections():
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        name_stem_ru,
        name_stem_uk,
    )

    # every inflection of Саша / Шура and of Александр → one stem
    for w in ["саша", "сашей", "сашу", "шура", "шуре",
              "александр", "александра", "александром"]:
        assert name_stem_ru(w) == "александр", w
    for w in ["вова", "вовой", "володя", "владимир", "владимиру"]:
        assert name_stem_ru(w) == "владимир", w
    # paradigm repair: Snowball splits Михаил's own paradigm
    for w in ["миша", "мише", "михаила", "михаилу"]:
        assert name_stem_ru(w) == "миха", w
    # uk
    for w in ["сашко", "сашка", "олександр", "олександра"]:
        assert name_stem_uk(w) == "олександр", w


def test_name_stem_is_name_field_only_hazard_documented():
    """The collisions that make this a name-field-only analyzer:
    жена (wife) would conflate with Евгений — assert the hazard is
    real so nobody silently enables ru_names for general text."""
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        name_stem_ru,
        stem_ru,
    )

    assert stem_ru("жена") == "жен"
    assert name_stem_ru("жена") == name_stem_ru("евгения") == "евген"


def test_names_stemmer_warns_without_name_field_flag():
    """Configuring a "_names" stemmer without declaring the field a
    name field is the recall-destroying misconfiguration (ADVICE r04)
    — it must warn loudly; setting name_field=True must be silent."""
    import warnings

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig
    from hybrid_sanctions_search_engine_ray.functions.analyzer import get_analyzer

    import pytest as _pytest

    with _pytest.warns(UserWarning, match="person-name fields"):
        tok = get_analyzer(AnalyzerConfig(stem="ru_names", max_token_len=63))
    assert tok("Саша") == ["александр"]

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tok = get_analyzer(
            AnalyzerConfig(stem="uk_names", name_field=True, max_token_len=63))
    assert tok("Сашко") == ["олександр"]


def test_generated_diminutive_table_is_wired_and_conflates():
    """The generated wide tables (tools/audit_diminutives.py, derived
    from the reference's full diminutive resolution surface) extend the
    curated core: paradigms absent from the curated table conflate to
    the canonical name's own stem."""
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        name_stem_ru,
        name_stem_uk,
    )

    # ru: each diminutive lands exactly on its canonical's stem
    for dim, canon in [("веруня", "вера"), ("борька", "борис"),
                       ("анюта", "анна"), ("аннушка", "анна"),
                       ("наденька", "надежда"), ("ирочка", "ирина")]:
        assert name_stem_ru(dim) == name_stem_ru(canon), (dim, canon)
    # uk
    for dim, canon in [("гришко", "григорій"), ("петрусь", "петро")]:
        assert name_stem_uk(dim) == name_stem_uk(canon), (dim, canon)


def test_generated_diminutive_values_are_fixed_points():
    """A single post-Snowball dict hop must suffice: no generated value
    may itself be a key of the merged table mapping elsewhere (chains
    would make conflation order-dependent)."""
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        _DIM_RU_ALL,
        _DIM_UK_ALL,
    )

    for tbl in (_DIM_RU_ALL, _DIM_UK_ALL):
        for k, v in tbl.items():
            assert tbl.get(v, v) == v, (k, v)


def test_curated_table_overrides_generated():
    """Curated entries (hand-audited against the reference's paradigm
    repairs) win over generated ones on key collision."""
    from hybrid_sanctions_search_engine_ray.functions._diminutive_gen import (
        GEN_DIMINUTIVE_RU,
    )
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        _DIMINUTIVE_RU,
        _DIM_RU_ALL,
    )

    for k, v in _DIMINUTIVE_RU.items():
        assert _DIM_RU_ALL[k] == v
    assert len(_DIM_RU_ALL) >= len(GEN_DIMINUTIVE_RU)


def test_surname_gender_paradigm_repair_ru():
    """Reference gender_rules.py surface (FEMALE_SUFFIXES_RU): the
    masculine nominative -ов/-ев surname must conflate with its
    feminine and oblique forms — Snowball alone splits the nominative
    off its own paradigm (иванов→иван vs иванова→иванов)."""
    from hybrid_sanctions_search_engine_ray.functions.stemmer import name_stem_ru

    for fem, masc in [("иванова", "иванов"), ("ивановой", "иванов"),
                      ("смирнова", "смирнов"), ("лебедевой", "лебедев"),
                      ("козлова", "козлов"), ("соловьёва", "соловьёв")]:
        assert name_stem_ru(fem) == name_stem_ru(masc), (fem, masc)
    # the repair must NOT merge the surname with the bare given name
    assert name_stem_ru("иванов") != name_stem_ru("иван")
    # -ин/-ын paradigms were never split; unchanged
    assert name_stem_ru("путина") == name_stem_ru("путин") == "путин"
    # short words (Лев) never trigger the nominative guard
    assert name_stem_ru("лев") == "лев"


def test_generated_diminutive_table_has_no_single_letter_keys():
    """The full analyzer indexes initials as bare letters (А. С. Пушкин
    → а, с, пушкин), so a single-letter conflation key would merge
    every initial with some given name — the generator must never emit
    one, and the bare initial must stem to itself (code-review r05)."""
    from hybrid_sanctions_search_engine_ray.functions._diminutive_gen import (
        GEN_DIMINUTIVE_RU,
        GEN_DIMINUTIVE_UK,
    )
    from hybrid_sanctions_search_engine_ray.functions.stemmer import (
        name_stem_ru,
        name_stem_uk,
    )

    assert all(len(k) >= 2 for k in GEN_DIMINUTIVE_RU)
    assert all(len(k) >= 2 for k in GEN_DIMINUTIVE_UK)
    for ch in "абвгдежзиклмнопрстуфхцчшщэюя":
        assert name_stem_ru(ch) == ch, ch
    for ch in "абвгдежзиіїклмнопрстуфхцчшщюя":
        assert name_stem_uk(ch) == ch, ch
