"""Scalar expression library: every predicate/regex the reference uses,
re-expressed as native Catalyst ``Column`` expressions (SURVEY.md §2.4)."""

from open_data_linter_spark.functions.predicates import (  # noqa: F401
    is_number,
    is_string,
    is_integer,
    is_prefecture_code,
    is_prefecture_name,
    is_empty,
    is_include_number,
    is_jp_calendar_year,
    jp_era_to_western,
    has_whitespace,
    is_datetime_code,
    is_christian_era,
    is_num_with_brackets,
    is_num_with_num,
    is_number_string,
)
