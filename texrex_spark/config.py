"""Job configuration from the reference's own INI format.

texrex binds published object properties from ``[ClassName]`` sections of
an INI job file (data/texrex.ini:1-204; binder src/utils/trcfgscript /
TTrIni semantics: ``Key=Value`` lines, ``#`` comments, double-quoted
strings, ``|``-separated lists, 1/0 booleans).  A texrex user points the
binary at that file; this module lets them point THIS engine at the same
file: ``chain_config_from_ini(path)`` returns a ready
``clean.chain.ChainConfig`` with the trained artifacts the INI names
(FANN net, .prof profiles, utf8.norm) loaded through refdata.

Only the sections that configure per-document processing map onto the
Spark engine; queue/pool sizing sections (TTrApplication InQSize,
TTrReaderPool ReaderNumber, TTrWorkerPool WorkerNumber, ...) configure
the reference's thread scheduler, which Spark's own task scheduler
subsumes (SURVEY.md §3.1) — they parse but are ignored, reported by
``ignored_keys``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from . import refdata
from .clean.chain import ChainConfig
from .clean.secondpass import SecondPassConfig
from .clean.stripper import StripperConfig
from .clean.tokenize import TokenizerConfig

_SECTION = re.compile(r"^\[([^\]]+)\]\s*$")

# Sections whose keys configure the reference's queues / worker threads /
# IPC — subsumed by the Spark scheduler, never mapped.
SCHEDULER_SECTIONS = {
    "TTrApplication",
    "TTrReaderPool",
    "TTrWriterPool",
}
SCHEDULER_KEYS = {
    "TTrWorkerPool": {
        "WorkerNumber", "MaxWorkerNumber", "MinWorkerNumber", "BufferSize",
        "PopSleep", "PushSleep", "PushLimit",
    },
}


def parse_ini(text: str) -> dict[str, dict[str, object]]:
    """INI -> {section: {key: value}}; values typed like the reference's
    binder: quoted -> str, integral -> int, decimal -> float, else str."""
    out: dict[str, dict[str, object]] = {}
    section = ""
    for raw in text.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith(";"):
            continue
        m = _SECTION.match(line)
        if m:
            section = m.group(1)
            out.setdefault(section, {})
            continue
        if "=" not in line or not section:
            continue
        key, _, val = line.partition("=")
        out[section][key.strip()] = _coerce(val.strip())
    return out


def _coerce(val: str) -> object:
    if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
        return val[1:-1]
    try:
        return int(val)
    except ValueError:
        pass
    try:
        return float(val)
    except ValueError:
        pass
    return val


def _flag(sec: dict, key: str, default: bool) -> bool:
    v = sec.get(key)
    return default if v is None else bool(int(v))


@dataclass
class IniJob:
    """Everything the engine derives from one texrex INI job file."""

    chain: ChainConfig
    writer: dict[str, object] = field(default_factory=dict)
    ignored_keys: list[str] = field(default_factory=list)


def chain_config_from_ini(
    path_or_text: str, data_dir: str | None = None
) -> IniJob:
    """Build a ChainConfig from a texrex INI job file (path or raw text).

    data_dir: where the artifacts the INI names live (FannFile,
    ProfileFile, ReplacementFile) — defaults to refdata.DATA_DIR, i.e.
    the reference checkout's data/ directory, exactly where the INI's
    relative file names point."""
    text = path_or_text
    if "\n" not in path_or_text and not path_or_text.lstrip().startswith("["):
        with open(path_or_text, encoding="utf-8") as f:
            text = f.read()
    ini = parse_ini(text)
    ignored: list[str] = []
    for s in SCHEDULER_SECTIONS:
        ignored.extend(f"{s}.{k}" for k in ini.get(s, ()))
    for s, keys in SCHEDULER_KEYS.items():
        ignored.extend(f"{s}.{k}" for k in ini.get(s, ()) if k in keys)

    pool = ini.get("TTrWorkerPool", {})
    cfg = ChainConfig()

    # ---- stripper (TTrHtmlStripper, trhtmlstripper.pas published props)
    st = ini.get("TTrHtmlStripper", {})
    sc = StripperConfig()
    sc.extract_anchors = _flag(st, "ExtractAnchors", True)
    sc.keep_same_host_links = _flag(st, "KeepSameHostLinks", True)
    sc.keep_same_virtual_host_links = _flag(st, "KeepSameVirtualHostLinks", True)
    sc.keep_external_links = _flag(st, "KeepExternalLinks", True)
    sc.minimal_link_length = int(st.get("MinimalLinkLength", 16))
    sc.maximal_link_length = int(st.get("MaximalLinkLength", 1024))
    cfg.stripper = sc

    # ---- second pass (TTrSecondPass)
    sp = ini.get("TTrSecondPass", {})
    spc = SecondPassConfig()
    spc.cleanse_tags = _flag(sp, "CleanseTags", True)
    spc.cleanse_email = _flag(sp, "CleanseEmail", True)
    spc.cleanse_uri = _flag(sp, "CleanseUri", True)
    spc.cleanse_hashtag = _flag(sp, "CleanseHashtag", True)
    spc.double_wash_entities = _flag(sp, "DoubleWashEntities", True)
    if "EmailReplacer" in sp:
        spc.email_replacer = str(sp["EmailReplacer"])
    if "UriReplacer" in sp:
        spc.uri_replacer = str(sp["UriReplacer"])
    if "HashtagReplacer" in sp:
        spc.hashtag_replacer = str(sp["HashtagReplacer"])
    cfg.secondpass = spc

    # ---- simple filter (TTrSimpleDocumentFilter)
    sf = ini.get("TTrSimpleDocumentFilter", {})
    cfg.use_simple_filter = _flag(pool, "UseSimpleFilter", False)
    cfg.simple_div_threshold = int(sf.get("DivThreshold", 2))
    cfg.simple_size_threshold = int(sf.get("SizeThreshold", 1000))

    # ---- deboilerplater (TTrDeboilerplater)
    db = ini.get("TTrDeboilerplater", {})
    cfg.use_deboilerplater = _flag(pool, "UseDeboilerplater", False)
    if cfg.use_deboilerplater:
        fann = str(db.get("FannFile", "boilerplate.iso.net"))
        lang = fann.split(".")[-2] if fann.count(".") >= 2 else "iso"
        cfg.boilerplate_net = refdata.load_boilerplate_net(lang, data_dir)
    bc = cfg.boilerplate
    bc.threshold = float(db.get("Threshold", 0.55))
    bc.min_divs_below = int(db.get("MinDivsBelowThreshold", 1))
    bc.min_div_proportion_below = float(
        db.get("MinDivProportionBelowThreshold", 0.1)
    )
    bc.min_chars_below = int(db.get("MinCharsBelowThreshold", 500))
    bc.min_char_proportion_below = float(
        db.get("MinCharProportionBelowThreshold", 0.25)
    )
    if "CustomRegex" in db:
        bc.custom_regex = str(db["CustomRegex"])

    # ---- tokenizer (TTrUnicodeLetterRangeTokenizer)
    tk = ini.get("TTrUnicodeLetterRangeTokenizer", {})
    tc = TokenizerConfig()
    tc.max_boilerplate = float(tk.get("MaxBoilerplate", 0.55))
    tc.min_length = int(tk.get("MinLength", 0))
    cfg.tokenizer = tc

    # ---- assessment (TTrTextAssessmentMulti + named profile sections)
    multi = ini.get("TTrTextAssessmentMulti", {})
    use_multi = _flag(pool, "UseTextAssessmentMulti", False)
    use_single = _flag(pool, "UseTextAssessment", False)
    cfg.use_assessment = use_multi or use_single
    profiles = []
    if use_multi and "Profiles" in multi:
        for name in str(multi["Profiles"]).split("|"):
            psec = ini.get(name.strip(), {})
            pfile = str(psec.get("ProfileFile", ""))
            if pfile.endswith(".prof"):
                prof = refdata.load_profile(
                    pfile[:-5], float(psec.get("Threshold", 35)), data_dir
                )
                if prof is not None:
                    profiles.append(prof)
    elif use_single:
        single = ini.get("TTrTextAssessment", {})
        pfile = str(single.get("ProfileFile", ""))
        if pfile.endswith(".prof"):
            prof = refdata.load_profile(
                pfile[:-5], float(single.get("Threshold", 35)), data_dir
            )
            if prof is not None:
                profiles.append(prof)
    cfg.profiles = profiles
    cfg.assessment_threshold = float(multi.get("MetaThreshold", 35))
    cfg.good_enough = float(multi.get("BreakThreshold", 15))

    # ---- shingler (TTrShingler)
    sh = ini.get("TTrShingler", {})
    cfg.use_shingler = _flag(pool, "UseShingler", True)
    cfg.shingle_hashes = int(sh.get("HashesNumber", cfg.shingle_hashes))

    # ---- normalizer (TTrNormalizer)
    nm = ini.get("TTrNormalizer", {})
    if _flag(pool, "UseNormalizer", True) and str(
        nm.get("ReplacementFile", "")
    ).endswith(".norm"):
        cfg.norm_replacements = refdata.load_norm_table(data_dir)

    # ---- div dedup (TTrDivDeduplicator)
    cfg.use_div_dedup = _flag(pool, "UseDivDeduplicator", True)

    writer = dict(ini.get("TTrWriterPool", {}))
    return IniJob(chain=cfg, writer=writer, ignored_keys=sorted(ignored))
