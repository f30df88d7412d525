"""Gate definition modules (split from queries.py at round 12 —
VERDICT r11 item 5). Do NOT import these directly for registration:
pdf_brain_spark.queries imports them in registration order.
"""
