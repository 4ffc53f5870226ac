"""Expression engine public surface (reference: expression/core factories)."""
from .base import (Alias, AttributeAt, BoundExpression, EvalContext,
                   EvaluationError, Expression, ExprValue, NamedAttribute, col)
from .terminal import (Const, ConstBool, ConstDate, ConstDateTime, ConstDouble,
                       ConstFloat, ConstInt32, ConstInt64, ConstString,
                       ConstUint32, ConstUint64, Null, RandInt32, Sequence)
from .arithmetic import (CppDivide, CppDivideNulling, CppDivideSignaling,
                         Divide, DivideNulling, DivideQuiet, DivideSignaling,
                         Minus, Modulus, ModulusNulling, ModulusSignaling,
                         Multiply, Negate, Plus)
from .comparison import (Equal, Greater, GreaterOrEqual, In, IsEven, IsOdd,
                         Less, LessOrEqual, NotEqual)
from .logic import (And, AndNot, BitwiseAnd, BitwiseNot, BitwiseOr, BitwiseXor,
                    Not, Or, ShiftLeft, ShiftRight, Xor)
from .elementary import (Case, CastTo, If, IfNull, IsNull, NullingIf,
                         ParseStringNulling, ParseStringQuiet)
