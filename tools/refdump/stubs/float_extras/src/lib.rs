//! Minimal offline stand-in for `float_extras`: only `f64::nextafter`.

/// C nextafter(x, y): the next representable f64 after x in the direction
/// of y.
pub fn nextafter_impl(x: f64, y: f64) -> f64 {
    if x.is_nan() || y.is_nan() {
        return core::f64::NAN;
    }
    if x == y {
        return y;
    }
    if x == 0.0 {
        // smallest subnormal toward y
        return <f64>::from_bits(1).copysign(y);
    }
    let bits = x.to_bits();
    let next = if (y > x) == (x > 0.0) { bits + 1 } else { bits - 1 };
    <f64>::from_bits(next)
}

pub mod f64 {
    pub use crate::nextafter_impl as nextafter;
}
