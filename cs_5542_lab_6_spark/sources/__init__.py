from .tables import TABLE_NAMES, fan_out, load_table, register_views

__all__ = ["TABLE_NAMES", "fan_out", "load_table", "register_views"]
