"""App-wide 17-locale i18n table (config/i18n.py).

The bundled table mirrors the reference's per-locale translation files
(`src/i18n/locales/<locale>/translation.json`); resolution follows the
i18next fallback chain (`src/i18n/index.ts`) and the tray zh-TW rule
(`tray_i18n.rs:22-36`).
"""

from spittle_tpu.config.i18n import (
    available_locales,
    get_locale_table,
    load_app_i18n,
    translate,
)

EXPECTED_LOCALES = [
    "ar", "cs", "de", "en", "es", "fr", "it", "ja", "ko", "pl", "pt",
    "ru", "tr", "uk", "vi", "zh", "zh-TW",
]


def test_all_17_locales_present():
    assert available_locales() == EXPECTED_LOCALES


def test_every_locale_has_all_top_sections():
    table = load_app_i18n()
    sections = set(table["en"].keys())
    assert {"tray", "settings", "onboarding", "sidebar", "common",
            "overlay", "errors"} <= sections
    for loc, tree in table.items():
        assert set(tree.keys()) == sections, loc


def test_locale_resolution_chain():
    # exact match preserves region (zh-TW stays Traditional)
    assert get_locale_table("zh-TW") is not get_locale_table("zh")
    assert get_locale_table("zh-TW")["tray"]["settings"] == "設定..."
    assert get_locale_table("zh")["tray"]["settings"] == "设置..."
    # language-code fallback: de-DE -> de
    assert get_locale_table("de-DE") == get_locale_table("de")
    # unknown -> English
    assert get_locale_table("xx")["tray"]["quit"] == "Quit"
    assert get_locale_table(None) == get_locale_table("en")


def test_translate_dot_paths():
    assert translate("tray.settings", "fr") == "Paramètres..."
    assert translate("sidebar.history", "en") == "History"
    assert translate("common.save", "ja") == "保存"
    # missing leaf falls back to English, then to the key itself
    assert translate("no.such.key", "de") == "no.such.key"


def test_english_fallback_covers_untranslated_keys():
    """The reference's non-en locales lack ~62 newer keys (e.g.
    settings.general.segmentOnSilence.*); i18next serves English for
    those — translate() must do the same, and the en table must be a
    superset of every locale's keys."""

    def leaves(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= leaves(v, prefix + k + ".")
            else:
                out.add(prefix + k)
        return out

    table = load_app_i18n()
    en = leaves(table["en"])
    assert len(en) >= 350
    for loc, tree in table.items():
        assert leaves(tree) <= en, loc
    # a key absent from de resolves through the English fallback
    assert "settings.general.segmentOnSilence.label" not in leaves(
        table["de"]
    )
    assert translate(
        "settings.general.segmentOnSilence.label", "de"
    ) == translate("settings.general.segmentOnSilence.label", "en")


def test_tray_translations_derive_from_app_table():
    from spittle_tpu.app.ui_state import get_tray_translations

    for loc in EXPECTED_LOCALES:
        strings = get_tray_translations(loc)
        assert set(strings.keys()) == {
            "settings", "checkUpdates", "copyLastTranscript",
            "unloadModel", "quit", "cancel",
        }
        assert strings == load_app_i18n()[loc]["tray"]
