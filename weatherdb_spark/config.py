"""Engine configuration constants mirroring the reference's defaults.

Citations into /root/reference:
- min_date 1999-01-01: weatherdb/config/config_default.ini:144
- max fillup distance: 130 km for EVERY parameter — StationBases.py:1377
  reads the 'p' key of [weatherdb:max_fillup_distance] (130000,
  config_default.ini:161-169) regardless of the station's own parameter;
  the t/et 150000 entries are never consulted, and 200000 is only the
  configparser fallback when the section is absent
- max gap for linear interpolation: config_default.ini:146-158 (p '1h', t/et '2d')
- decimals (scaled-int storage): StationBases.py:3127 (p x100),
  StationT.py:28 (t x10), StationET.py:27 (et x10)
- aggregation lattice: weatherdb/station/constants.py:4-19
- coverage gate 0.8 on resampling: StationBases.py:2544-2616
- yearly-MA coverage 0.9: StationBases.py:940-958
- elevation weighting L*(1+(|dh|/P1)^P2), P1=250, P2=1.5:
  StationBases.py:2196-2209, 2919-2942
"""

from __future__ import annotations

MIN_DATE = "1999-01-01"

# ordered aggregation lattice (station/constants.py:4-19)
AGGREGATIONS: list[str | None] = [None, "10 min", "hour", "day", "month", "year", "decade"]

# kinds stored verbatim in scaled-int storage mode — never multiplied by
# the decimals factor (reference _kinds_not_decimal, StationBases.py:60)
KINDS_NOT_DECIMAL = ("qn", "filled_by", "filled_share")

# parameter metadata: decimals scale, agg function, min granularity,
# valid kinds, best kind, fillup settings
PARAMETERS: dict[str, dict] = {
    "p": {
        "decimals": 100,
        "agg_fun": "sum",
        "unit": "mm/10min",               # StationP.py:61
        "long_name": "Precipitation",     # StationP.py:60
        "min_agg_to": "10 min",
        "kinds": ["raw", "qn", "qc", "filled", "filled_by", "corr"],
        "best_kind": "corr",
        "max_fillup_dist_km": 130.0,
        "max_gap_interp": "1 hour",
        "ma_terms": ["wihy", "suhy", "year"],
        "ma_raster_key": "hyras",
        "coef_sign": "mult",
        # (365//2 - 10) days x 24 x 6 at 10-min resolution
        # (StationBases.py:3158-3163)
        "adj_min_count": 24768,
    },
    "p_d": {
        "decimals": 100,
        "agg_fun": "sum",
        "unit": "mm/day",                   # StationPD.py:31
        "long_name": "daily Precipitation", # StationPD.py:30
        "min_agg_to": "day",
        "kinds": ["raw", "filled", "filled_by"],
        "best_kind": "filled",
        "max_fillup_dist_km": 130.0,  # the 'p' key applies, StationBases.py:1377
        "max_gap_interp": None,
        "ma_terms": ["wihy", "suhy", "year"],
        "ma_raster_key": "hyras",
        "coef_sign": "mult",
        "adj_min_count": 172,  # (365//2 - 10) days
    },
    "t": {
        "decimals": 10,
        "agg_fun": "avg",
        "unit": "°C",                    # StationT.py:27
        "long_name": "Temperature",      # StationT.py:26
        "min_agg_to": "day",
        "kinds": ["raw", "raw_min", "raw_max", "qc", "filled",
                  "filled_min", "filled_max", "filled_by"],
        "best_kind": "filled",
        "max_fillup_dist_km": 130.0,  # the 'p' key applies, StationBases.py:1377
        "max_gap_interp": "2 days",
        "ma_terms": ["year"],
        "ma_raster_key": "dwd",
        "coef_sign": "add",
        "fillup_n_donors": 5,  # median of 5 neighbors, StationT.py:122-143
        # beyond this, one donor suffices (_fillup_max_dist, StationT.py:48)
        "fillup_near_dist_km": 100.0,
        # T's get_adj means over ALL years (no pandas min_count,
        # StationT.py:152-156)
        "adj_min_count": 1,
    },
    "et": {
        "decimals": 10,
        "agg_fun": "sum",
        "unit": "mm/Tag",                # StationET.py:26
        "long_name": "potential Evapotranspiration",  # StationET.py:25
        # ET zips carry a version prefix in the CDC listing
        # (StationET.py:31); other parameters match on _<stid>_ alone
        "ftp_zip_regex_prefix": r".*_v2_",
        "min_agg_to": "day",
        "kinds": ["raw", "qc", "filled", "filled_by"],
        "best_kind": "filled",
        "max_fillup_dist_km": 130.0,  # the 'p' key applies, StationBases.py:1377
        "max_gap_interp": "2 days",
        "ma_terms": ["year"],
        "ma_raster_key": "dwd",
        "coef_sign": "mult",
        "adj_min_count": 345,  # days, StationET.py:107
    },
}

COVERAGE_GATE = 0.8        # A1 resampling gate
MA_COVERAGE_GATE = 0.9     # A2 yearly MA gate


def user_setting(section: str, option: str, fallback, cast=float):
    """Resolve a knob through the user-config layer (userconfig.py) with
    the module constant as fallback — the shipped config_default.ini
    mirrors these constants, so the answer only changes when a user
    config or env var overrides it."""
    import configparser

    from weatherdb_spark.userconfig import get_config

    try:
        getter = {
            float: "getfloat", int: "getint", bool: "getboolean",
        }.get(cast)
        if getter is None:
            return cast(get_config().get(section, option))
        return getattr(get_config(), getter)(section, option)
    except (configparser.NoSectionError, configparser.NoOptionError):
        # knob not in the shipped defaults or any user layer
        return fallback
    except ValueError as exc:
        # a malformed USER value must fail loudly, not silently run the
        # pipeline with the shipped default the user believes overridden
        raise ValueError(
            f"user config [{section}] {option} is not a valid "
            f"{cast.__name__}: {exc}"
        ) from exc
ELEV_WEIGHT_P1 = 250.0
ELEV_WEIGHT_P2 = 1.5
KNN_DEFAULT = 5

# Richter exposure classes from horizon angle (StationP.py:33-50)
RICHTER_CLASS_BINS: list[tuple[str, float, float]] = [
    ("no-protection", 0.0, 3.0),
    ("little-protection", 3.0, 7.0),
    ("protected", 7.0, 12.0),
    ("heavy-protection", 12.0, float("inf")),
]

# Richter correction coefficients
# (weatherdb/db/fixtures/RichterParameters.json, models.py:257-298)
RICHTER_PARAMETERS: list[dict] = [
    {"precipitation_typ": "precip_summer", "e": 0.38,
     "b_no-protection": 0.345, "b_little-protection": 0.31,
     "b_protected": 0.28, "b_heavy-protection": 0.245},
    {"precipitation_typ": "precip_winter", "e": 0.46,
     "b_no-protection": 0.34, "b_little-protection": 0.28,
     "b_protected": 0.24, "b_heavy-protection": 0.19},
    {"precipitation_typ": "mix", "e": 0.55,
     "b_no-protection": 0.535, "b_little-protection": 0.39,
     "b_protected": 0.305, "b_heavy-protection": 0.185},
    {"precipitation_typ": "snow", "e": 0.82,
     "b_no-protection": 0.72, "b_little-protection": 0.51,
     "b_protected": 0.33, "b_heavy-protection": 0.21},
]
