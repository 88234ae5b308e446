"""Scalar-function surface (string/date/math/array/json packs)."""
