from .parse import build_service_log_text, parse_service_logs

__all__ = ["build_service_log_text", "parse_service_logs"]
