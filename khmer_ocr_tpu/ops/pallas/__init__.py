from .lstm import lstm_recurrence, pallas_lstm_available

__all__ = ["lstm_recurrence", "pallas_lstm_available"]
