from voter_gateway_spark.functions.registry import (
    EXTENSIONS,
    election_name,
    coerce_to_date_or_null,
    is_email_address_valid,
    needs_geocoding,
    location_point,
    point_wkt,
    point_wkb,
    register_all,
)

__all__ = [
    "EXTENSIONS",
    "election_name",
    "coerce_to_date_or_null",
    "is_email_address_valid",
    "needs_geocoding",
    "location_point",
    "point_wkt",
    "point_wkb",
    "register_all",
]
