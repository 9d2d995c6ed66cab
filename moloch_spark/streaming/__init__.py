from moloch_spark.streaming.sessionizer import streaming_sessionize
from moloch_spark.streaming.cron import CronQuery, CronRunner

__all__ = ["streaming_sessionize", "CronQuery", "CronRunner"]
