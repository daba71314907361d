"""Custom operators Spark lacks as built-ins, composed from DataFrame ops."""
