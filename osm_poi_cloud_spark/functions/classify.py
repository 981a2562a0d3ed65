"""POI classification — the reference's 27-class ordered CASE.

Rule source: ``stack/batch/process.py:220-275`` (identical rules in
``_deprecated/process_region.py:162-244``). The CASE arms are
**order-sensitive** (e.g. ``amenity=ice_cream`` hits the ``fast_food``
arm before ``shop=ice_cream`` can hit ``ice_cream``), so the rules live
in one data table from which we generate, in the same order:

* a Spark ``F.when(...).when(...).otherwise(None)`` column (codegen'd
  into a single JVM expression — no UDF), and
* SQL CASE text valid in both Spark SQL and DuckDB (used by the
  oracle queries so engine and oracle share one rule encoding).
"""

from __future__ import annotations

try:
    from pyspark.sql import Column
    from pyspark.sql import functions as F
except ImportError:  # pragma: no cover
    Column = None  # type: ignore[assignment]
    F = None  # type: ignore[assignment]

# (key, values, class). values semantics:
#   tuple  -> key IN values
#   str    -> key = value
#   None   -> key IS NOT NULL
# Order matters — this is a faithful transcription of process.py:220-275.
CLASS_RULES: list[tuple[str, tuple[str, ...] | str | None, str]] = [
    ("amenity", ("restaurant", "food_court", "diner", "bbq"), "restaurant"),
    ("amenity", ("cafe", "coffee_shop", "tea"), "cafe_bakery"),
    ("amenity", ("bar", "pub", "biergarten"), "bar_pub"),
    ("amenity", ("fast_food", "food_truck", "ice_cream", "street_vendor"), "fast_food"),
    ("shop", ("ice_cream", "dessert", "frozen_yogurt"), "ice_cream"),
    ("shop", ("supermarket", "convenience", "grocery", "marketplace"), "grocery"),
    ("amenity", "marketplace", "grocery"),
    ("shop", ("bakery", "butcher", "cheese", "confectionery", "chocolate",
              "deli", "fishmonger", "frozen_food", "greengrocer",
              "health_food", "organic", "pastry", "tea", "coffee"), "specialty_food"),
    ("shop", ("mall", "department_store", "car", "clothes", "fashion",
              "shoes", "electronics", "computer", "hardware", "doityourself",
              "furniture", "jewelry", "toys", "books", "gift", "cosmetics"), "retail"),
    ("amenity", ("spa", "sauna", "hairdresser", "beauty_salon", "laundry", "dry_cleaning"), "personal_services"),
    ("shop", ("hairdresser", "beauty", "massage"), "personal_services"),
    ("amenity", ("coworking_space", "conference_centre"), "professional_services"),
    ("office", ("company", "lawyer", "architect", "estate_agent", "accountant"), "professional_services"),
    ("amenity", ("bank", "atm", "bureau_de_change", "money_transfer"), "finance"),
    ("tourism", ("hotel", "guest_house", "hostel", "motel", "apartment",
                 "chalet", "alpine_hut", "camp_site", "caravan_site"), "lodging"),
    ("amenity", ("bus_station", "ferry_terminal"), "transport"),
    ("railway", ("station", "halt", "stop", "tram_stop"), "transport"),
    ("public_transport", "station", "transport"),
    ("aeroway", ("aerodrome", "terminal"), "transport"),
    ("amenity", ("fuel", "charging_station", "car_wash", "car_rental", "car_repair"), "auto_services"),
    ("shop", ("car_repair", "tyres"), "auto_services"),
    ("amenity", ("parking", "bicycle_parking", "motorcycle_parking"), "parking"),
    ("amenity", ("hospital", "clinic", "doctors", "dentist", "pharmacy", "ambulance_station"), "healthcare"),
    ("healthcare", None, "healthcare"),
    ("amenity", ("school", "kindergarten", "college", "university",
                 "music_school", "language_school", "library"), "education"),
    ("amenity", ("townhall", "courthouse", "police", "fire_station",
                 "post_office", "embassy"), "government"),
    ("office", "government", "government"),
    ("amenity", ("community_centre", "social_centre", "youth_centre",
                 "social_facility", "shelter"), "community"),
    ("amenity", ("place_of_worship", "church", "mosque", "temple", "synagogue"), "religious"),
    ("tourism", ("museum", "gallery"), "culture"),
    ("amenity", ("arts_centre", "theatre", "concert_hall", "planetarium"), "culture"),
    ("amenity", ("cinema", "nightclub", "casino", "bowling_alley", "amusement_arcade"), "entertainment"),
    ("leisure", ("bowling_alley", "escape_game"), "entertainment"),
    ("leisure", ("sports_centre", "fitness_centre", "gym", "swimming_pool",
                 "stadium", "pitch", "ice_rink", "golf_course"), "sports_fitness"),
    ("leisure", ("park", "garden", "nature_reserve", "playground", "dog_park"), "parks_outdoors"),
    ("tourism", ("picnic_site", "viewpoint"), "parks_outdoors"),
    ("natural", "beach", "parks_outdoors"),
    ("tourism", ("attraction", "information"), "landmark"),
    ("historic", ("monument", "memorial", "castle", "ruins"), "landmark"),
    ("man_made", ("lighthouse", "tower"), "landmark"),
    ("amenity", ("veterinary", "animal_boarding", "animal_shelter"), "animal_services"),
    ("shop", "pet", "animal_services"),
    ("shop", None, "retail"),
]

# Final fallback arm (process.py:273): any of amenity/leisure/tourism set -> 'misc'.
FALLBACK_KEYS = ("amenity", "leisure", "tourism")
FALLBACK_CLASS = "misc"

TAG_KEYS = (
    "amenity", "shop", "leisure", "tourism", "office", "healthcare",
    "railway", "aeroway", "historic", "man_made", "natural", "public_transport",
)

PASSTHROUGH_KEYS = (
    "cuisine", "opening_hours", "phone", "website", "brand", "operator",
)

ALL_CLASSES = sorted({c for _, _, c in CLASS_RULES} | {FALLBACK_CLASS})


def _quote(name: str) -> str:
    """Quote identifiers that are keywords (natural, operator).

    Double quotes are identifier quotes in DuckDB but string literals in
    default Spark SQL — so any CASE text destined for *both* engines must
    instead remap these keys to safe column names via ``col_of``
    (e.g. ``{"natural": "natural_tag"}``).
    """
    return f'"{name}"' if name in ("natural", "operator") else name


def class_sql(col_of: dict[str, str] | None = None) -> str:
    """SQL CASE text (Spark SQL + DuckDB compatible).

    ``col_of`` optionally maps tag key -> column expression (defaults to
    the quoted key itself).
    """
    col_of = col_of or {}

    def ref(key: str) -> str:
        return col_of.get(key, _quote(key))

    arms = []
    for key, values, cls in CLASS_RULES:
        if values is None:
            cond = f"{ref(key)} IS NOT NULL"
        elif isinstance(values, str):
            cond = f"{ref(key)} = '{values}'"
        else:
            vals = ", ".join(f"'{v}'" for v in values)
            cond = f"{ref(key)} IN ({vals})"
        arms.append(f"WHEN {cond} THEN '{cls}'")
    fb = " OR ".join(f"{ref(k)} IS NOT NULL" for k in FALLBACK_KEYS)
    arms.append(f"WHEN {fb} THEN '{FALLBACK_CLASS}'")
    return "CASE " + " ".join(arms) + " ELSE NULL END"


def class_col(col_of: dict[str, "Column"] | None = None) -> "Column":
    """Spark Column evaluating the ordered CASE (pure expression, no UDF)."""
    col_of = col_of or {}

    def ref(key: str) -> "Column":
        # DataFrame-API column resolution doesn't parse SQL, so reserved
        # words (natural, operator) need no quoting here.
        return col_of.get(key, F.col(key))

    expr = None
    for key, values, cls in CLASS_RULES:
        c = ref(key)
        if values is None:
            cond = c.isNotNull()
        elif isinstance(values, str):
            cond = c == values
        else:
            cond = c.isin(*values)
        expr = F.when(cond, cls) if expr is None else expr.when(cond, cls)
    fb = None
    for k in FALLBACK_KEYS:
        c = ref(k).isNotNull()
        fb = c if fb is None else (fb | c)
    return expr.when(fb, FALLBACK_CLASS).otherwise(F.lit(None))


def classify_tags(tags: dict[str, str | None]) -> str | None:
    """Pure-Python rule evaluation — test oracle and driver-side helper."""
    for key, values, cls in CLASS_RULES:
        v = tags.get(key)
        if v is None:
            continue
        if values is None or (isinstance(values, str) and v == values) or (
            isinstance(values, tuple) and v in values
        ):
            return cls
    if any(tags.get(k) is not None for k in FALLBACK_KEYS):
        return FALLBACK_CLASS
    return None
