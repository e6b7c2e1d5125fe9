"""(placeholder — filled in as coverage widens)"""
