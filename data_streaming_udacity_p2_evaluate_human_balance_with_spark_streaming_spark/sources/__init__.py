from .files import TABLES, load_table, load_tables, register_views  # noqa: F401
from .memory import batch_from_rows, stream_from_rows  # noqa: F401
