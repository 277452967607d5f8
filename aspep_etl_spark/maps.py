"""Recode data for ASPEP canonicalization, stored as parse-at-import tables.

This is *data*, not logic: the vocabulary of historical spellings the Census
files use and the canonical names the engine's fact table standardizes on.
Semantics it must reproduce (see SURVEY.md §2.3 J2/J3): a value recode is
exact-match with **pass-through** — values absent from the map survive
unchanged (pandas ``df.replace`` behavior, reference
``process_aspep/assets.py:306``).  Map contents correspond to the reference's
``process_aspep/constants.py:1-189``.

At scale these maps become broadcast lookup tables (see
``operators/recode.py``); they are kept as plain data here so both the
driver-side ingest adapters and the distributed operators share one source
of truth.
"""

from __future__ import annotations


def _parse_pairs(block: str) -> dict[str, str]:
    """Parse ``variant => canonical`` lines into a dict."""
    out: dict[str, str] = {}
    for line in block.strip().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        variant, _, canonical = line.partition("=>")
        out[variant.strip()] = canonical.strip()
    return out


# ---------------------------------------------------------------------------
# Legacy (multi-row-header era, ≤2023) column canonicalization.
# Keys are slugified collapsed headers; values are canonical measure names.
# Reference: process_aspep/constants.py:29-45 (COLUMN_MAP).
# ---------------------------------------------------------------------------
LEGACY_COLUMN_CANON = _parse_pairs("""
    fulltime_and_parttime_employment       => ft_pt_employment
    fulltime_employees                     => ft_employment
    fulltime_employment                    => ft_employment
    fulltime_equivalent_employment         => ft_eq_employment
    fulltime_pay                           => ft_pay
    fulltime_payroll                       => ft_pay
    march_pay                              => total_pay
    parttime_employees                     => pt_employment
    parttime_employment                    => pt_employment
    parttime_hours                         => pt_hour
    parttime_pay                           => pt_pay
    parttime_payroll                       => pt_pay
    total_fulltime_and_parttime_employment => ft_pt_employment
    total_march_payroll                    => total_pay
    total_payroll                          => total_pay
""")

# ---------------------------------------------------------------------------
# 2024+ ("API era") flat headers → canonical names.  NOTE the era quirk the
# engine must preserve: this era emits ``pt_hours`` while the legacy era
# emits ``pt_hour`` — the canonical schema carries BOTH, each null for the
# other era (SURVEY.md §7.2).  Reference: constants.py:47-58.
# ---------------------------------------------------------------------------
TIDY_2024_COLUMN_CANON = _parse_pairs("""
    Geographic Area Name                      => state
    Meaning of Aggregate Description          => gov_function
    Full-Time Employment                      => ft_employment
    Full-Time Payroll                         => ft_pay
    Part-Time Employment                      => pt_employment
    Part-Time Payroll                         => pt_pay
    Part-Time Hours                           => pt_hours
    Full-Time Equivalent Employment           => ft_eq_employment
    Total Full-Time and Part-Time Employment  => ft_pt_employment
    Total Full-Time and Part-Time Payroll     => total_pay
""")

# Measure columns requiring dirty-numeric cleansing in the 2024 era
# (reference constants.py:60-63).
TIDY_2024_NUMERIC_COLS = (
    "ft_employment",
    "ft_pay",
    "pt_employment",
    "pt_pay",
    "pt_hours",
    "ft_eq_employment",
    "ft_pt_employment",
    "total_pay",
)

# ---------------------------------------------------------------------------
# Government-function vocabulary normalization: ~60 historical spellings to
# ~30 canonical functions.  Reference: constants.py:66-133 (GOV_FUNCTION_MAP).
# ---------------------------------------------------------------------------
GOV_FUNCTION_CANON = _parse_pairs("""
    total                              => total - all government employment functions
    financial administration           => financial administration
    financial admin                    => financial administration
    central administration             => other government administration
    central admin                      => other government administration
    judicial & legal                   => judicial and legal
    judicial-legal                     => judicial and legal
    police arrest                      => police protection - persons with power of arrest
    police-arrest                      => police protection - persons with power of arrest
    persons with power of arrest       => police protection - persons with power of arrest
    police with power of arrest        => police protection - persons with power of arrest
    police protection - officers       => police protection - persons with power of arrest
    police officers only               => police protection - persons with power of arrest
    police-other                       => police protection - other
    police - other                     => police protection - other
    police other                       => police protection - other
    other police employees             => police protection - other
    correction                         => corrections
    streets & highways                 => highways
    streets & hwys                     => highways
    airports                           => air transportation
    water transportation               => sea and inland port facilities
    water transport and terminals      => sea and inland port facilities
    water transport & terminals        => sea and inland port facilities
    water transport                    => sea and inland port facilities
    water transport and canals         => sea and inland port facilities
    social insurance admin             => social insurance administration
    soc insur admin                    => social insurance administration
    solid waste mgmt                   => solid waste management
    sewage disposal                    => sewerage
    parks & recreation                 => parks and recreation
    housing & comm dev                 => housing and community development
    housing & community development    => housing and community development
    housing and community developmen   => housing and community development
    elem & sec instruction             => education - elementary and secondary instructional
    elem & sec instructional employees => education - elementary and secondary instructional
    elem & sec instructional           => education - elementary and secondary instructional
    instructional employees            => education - elementary and secondary instructional
    elem&sec instruct                  => education - elementary and secondary instructional
    elem&sec other-tot                 => education - elementary and secondary other
    elem & sec - other                 => education - elementary and secondary other
    elem & sec other employees         => education - elementary and secondary other
    elem & secondary - other           => education - elementary and secondary other
    elem & sec  - other                => education - elementary and secondary other
    elem & sec admin/cler              => education - elementary and secondary other
    elem & sec oper/maint              => education - elementary and secondary other
    elem & sec cafeteria               => education - elementary and secondary other
    elem & sec bus transit             => education - elementary and secondary other
    elem & sec health/rec              => education - elementary and secondary other
    elem & sec student                 => education - elementary and secondary other
    elem & sec unalloc                 => education - elementary and secondary other
    higher ed - instructional          => education - higher education instructional
    higher ed instructional employees  => education - higher education instructional
    higher ed instructional            => education - higher education instructional
    higher ed instruct                 => education - higher education instructional
    higher ed - other                  => education - higher education other
    higher ed other                    => education - higher education other
    higher ed other employees          => education - higher education other
    other education                    => education - other
    other ed - state                   => education - other
    local libraries                    => libraries
    other & unallocable                => all other and unallocable
    other and unallocable              => all other and unallocable
    liquor stores                      => state liquor stores
""")

# ---------------------------------------------------------------------------
# State recode: lowercase full name → 2-letter uppercase code.  Reference
# builds this by inverting a code→name dict (constants.py:135-189); the
# pipeline applies it to lowercased state names (assets.py:306) and then
# uppercases to produce `state_code` (assets.py:307).
# ---------------------------------------------------------------------------
_STATES = """
    AL alabama       | AK alaska        | AZ arizona        | AR arkansas
    CA california    | CO colorado      | CT connecticut    | DE delaware
    FL florida       | GA georgia       | HI hawaii         | ID idaho
    IL illinois      | IN indiana       | IA iowa           | KS kansas
    KY kentucky      | LA louisiana     | ME maine          | MD maryland
    MA massachusetts | MI michigan      | MN minnesota      | MS mississippi
    MO missouri      | MT montana       | NE nebraska       | NV nevada
    NH new hampshire | NJ new jersey    | NM new mexico     | NY new york
    NC north carolina| ND north dakota  | OH ohio           | OK oklahoma
    OR oregon        | PA pennsylvania  | RI rhode island   | SC south carolina
    SD south dakota  | TN tennessee     | TX texas          | UT utah
    VT vermont       | VA virginia      | WA washington     | WV west virginia
    WI wisconsin     | WY wyoming       | US united states
"""

STATE_NAME_TO_CODE: dict[str, str] = {}
for _cell in _STATES.replace("\n", "|").split("|"):
    _cell = _cell.strip()
    if _cell:
        _code, _, _name = _cell.partition(" ")
        STATE_NAME_TO_CODE[_name.strip()] = _code.strip().upper()

STATE_CODE_TO_NAME = {v: k for k, v in STATE_NAME_TO_CODE.items()}

# ---------------------------------------------------------------------------
# Per-year workbook layout config: which rows hold the multi-row header.
# Years absent from HEADER_WINDOWS ship tidy flat headers (2024+).
# Reference: constants.py:1-27 (ASPEP_DATA_CONFIG).
# ---------------------------------------------------------------------------
HEADER_WINDOWS: dict[int, tuple[int, int]] = {}
for _year, _win in [
    ((2000,), (1, 3)), ((2001,), (3, 5)),
    (tuple(range(2002, 2007)), (1, 3)),
    ((2007, 2008), (9, 11)),
    (tuple(range(2009, 2012)), (10, 12)),
    ((2012, 2013), (11, 13)),
    ((2014, 2015, 2016), (9, 11)),
    ((2017,), (11, 13)),
    (tuple(range(2018, 2024)), (12, 14)),
]:
    for _y in _year:
        HEADER_WINDOWS[_y] = _win

# Sheet-name overrides for tidy-era workbooks (constants.py:26).
SHEET_NAMES: dict[int, str] = {2024: "Data"}

START_YEAR = 2003   # inclusive (reference assets.py:17)
END_YEAR = 2025     # exclusive (reference assets.py:18)
