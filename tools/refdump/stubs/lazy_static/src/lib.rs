//! Minimal offline stand-in for the `lazy_static` crate, sufficient to
//! compile the reference S2 library in this sandbox (no network access to
//! crates.io). Backed by `std::sync::LazyLock`.

#[macro_export]
macro_rules! lazy_static {
    () => {};
    ($(#[$attr:meta])* static ref $N:ident : $T:ty = $e:expr; $($rest:tt)*) => {
        $(#[$attr])*
        #[allow(non_upper_case_globals)]
        static $N: std::sync::LazyLock<$T> = std::sync::LazyLock::new(|| $e);
        lazy_static!($($rest)*);
    };
    ($(#[$attr:meta])* pub static ref $N:ident : $T:ty = $e:expr; $($rest:tt)*) => {
        $(#[$attr])*
        #[allow(non_upper_case_globals)]
        pub static $N: std::sync::LazyLock<$T> = std::sync::LazyLock::new(|| $e);
        lazy_static!($($rest)*);
    };
}
