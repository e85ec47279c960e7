from .chain import latest_full_backup, last_diff_backup, remaining_log_backups  # noqa: F401
from .etl import run_etl  # noqa: F401
from .restore_script import generate_restore_script, RestoreScript  # noqa: F401
from .watermark import read_source_servers, update_watermarks  # noqa: F401
