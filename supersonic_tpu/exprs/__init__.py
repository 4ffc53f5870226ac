"""Expression engine public surface (reference: expression/core factories)."""
from .base import (Alias, AttributeAt, BoundExpression, EvalContext,
                   EvaluationError, Expression, ExprValue,
                   InputAttributeProjection, NamedAttribute, Projection, col)
from .terminal import (Const, ConstBinary, ConstBool, ConstDataType,
                       ConstDate, ConstDateTime, ConstDouble,
                       ConstFloat, ConstInt32, ConstInt64, ConstString,
                       ConstUint32, ConstUint64, Null, RandInt32, Sequence,
                       TypedConst)
from .arithmetic import (CppDivide, CppDivideNulling, CppDivideSignaling,
                         Divide, DivideNulling, DivideQuiet, DivideSignaling,
                         Minus, Modulus, ModulusNulling, ModulusSignaling,
                         Multiply, Negate, Plus)
from .comparison import (Equal, Greater, GreaterOrEqual, In, IsEven, IsOdd,
                         Less, LessOrEqual, NotEqual)
from .logic import (And, AndNot, BitwiseAnd, BitwiseAndNot, BitwiseNot,
                    BitwiseOr, BitwiseXor,
                    Not, Or, ShiftLeft, ShiftRight, Xor)
from .elementary import (Case, CastNulling, CastQuiet, CastSignaling,
                         CastTo, Copy, If, IfNull, IsNull, NullingIf,
                         ParseStringNulling, ParseStringQuiet)
from .math import (Abs, Acos, Acosh, Asin, Asinh, Atan, Atan2, Atanh, Ceil,
                   CeilToInt, Cos, Cot, FloorToInt, LnQuiet, Log2Quiet,
                   Log2Signaling, Log10Quiet, Log10Signaling, LogNulling,
                   LogQuiet, RoundWithMultiplier, TruncToInt,
                   Cosh, Exp, Floor, Format, FormatSignaling, IsFinite,
                   IsInf, IsNaN, IsNormal, Ln,
                   LnNulling, LnSignaling, Log, Log2, Log2Nulling, Log10,
                   Log10Nulling, Pow, PowNulling, PowQuiet, PowSignaling,
                   Pi, PowerNulling, PowerQuiet, PowerSignaling, RandomDouble,
                   Round, RoundToInt, RoundWithPrecision, Sin, Sinh, Sqrt,
                   SqrtQuiet, ToDegrees, ToRadians,
                   SqrtNulling, SqrtSignaling, Tan, Tanh, Trunc)
from .string import (Concat, ConcatWithSeparator, Concatenate, Length, Ltrim, Rtrim,
                     StringContainsCI,
                     StringContains, SubstringSignaling,
                     StringOffset, StringReplace, Substring, ToLower, ToString,
                     TrailingSubstring,
                     ToUpper, Trim)
from .date import (AddDay, AddDays, AddMinute, AddMinutes, AddMonth,
                   AddMonths,
                   ConstDateTimeFromMicrosecondsSinceEpoch,
                   ConstDateTimeFromSecondsSinceEpoch, Now, ParseDateTime,
                   DateFormat,
                   DateFormatLocal, DateToDatetime, Day, DayLocal,
                   FromUnixTime, Hour, HourLocal, MakeDate, MakeDatetime,
                   Microsecond, MicrosecondLocal, Minute, MinuteLocal, Month,
                   MonthLocal,
                   Quarter, QuarterLocal, Second, SecondLocal, UnixTimestamp,
                   Weekday, WeekdayLocal, Year, YearDay, YearDayLocal,
                   YearLocal)
from .tz import get_local_timezone, set_local_timezone
from .stateful import (Changed, RunningMinWithFlush, RunningSum, Smudge,
                       SmudgeIf)
from .regexp import (RegexpExtract, RegexpFullMatch, RegexpPartialMatch,
                     RegexpReplace)
from .hashing import (Fingerprint, Hash, SupersonicFingerprint,
                      SupersonicHash)
